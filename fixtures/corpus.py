"""Deterministic KG fixture corpus + golden computation (FIXTURES.md §B).

Pages are generated from entity/relation templates over closed vocabularies,
so the exact expected output of every pipeline stage is computable here, in
plain Python, at generation time ("goldens by construction"). The golden
simulator imports the SAME frozen kernels the Spark operators wrap
(extract_text, detect_mentions_in_text, bfs_evidence, ...), so pipeline and
goldens share one spec; the driver-side independent check is the DuckDB
oracle harness, not this module.

Everything is a pure function of (n_pages, seed). numpy RandomState(seed),
no wall clock, no network.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np

from nary_relation_extraction_decomposed_spark.extract.html import extract_text
from nary_relation_extraction_decomposed_spark.functions.textnorm import (
    JACCARD_THRESHOLD,
    compact_form,
    normalize_surface,
    shingles,
)
from nary_relation_extraction_decomposed_spark.operators.kernels import (
    GazetteerIndex,
    bfs_evidence,
    detect_mentions_in_text,
    nearest_pred,
    sentence_predicates,
)

SEED = 42
PRED_VOCAB = ("inhibits", "activates", "binds", "modulates")
PIVOT_TYPE = "DRUG"
ARG_SLOTS = (("GENE", "a"), ("VARIANT", "b"))

_FILLER = (
    "the study results were reviewed by clinical staff across cohort sites "
    "analysis of trial data showed stable outcomes over time with standard "
    "methods and careful followup measurement during each visit period"
).split()
_MULTIBYTE_FILLER = ["café", "Müller", "naïve"]  # multi-byte byte-identity slice

_BASE_TS = datetime(2024, 3, 1, 0, 0, 0)

_DRUG_SYL = ["ad", "bel", "cor", "dex", "fen", "gal", "hep", "jul", "kel", "lom",
             "mar", "nev", "op", "pir", "quz", "rel", "sot", "tov", "vex", "wil"]
_DRUG_SUF = ["ax", "ol", "in", "ex", "um", "ide"]
_GENE_CON = list("bcdfghklmnprstvz")
_VAR_LET = list("acdefghiklmnpqrstvwy")


@dataclass(frozen=True)
class Entity:
    ent_id: str
    ent_type: str
    surfaces: tuple[str, ...]  # alias surface forms as they appear in text

    @property
    def canonical_norm(self) -> str:
        return min(normalize_surface(s) for s in self.surfaces)


def _jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb)


def make_entities(rng: np.random.RandomState) -> list[Entity]:
    """120 entities (40 DRUG / 40 GENE / 40 VARIANT), pairwise compact-shingle
    jaccard < JACCARD_THRESHOLD - margin, token-disjoint; aliases are
    case/punctuation variants only (identical compact form => exact ER)."""
    entities: list[Entity] = []
    used_tokens: set[str] = set(_FILLER) | set(PRED_VOCAB) | {
        normalize_surface(w) for w in _MULTIBYTE_FILLER
    } | {"patients", "carrying", "effect", "observed", "expression", "varies",
         "with", "in", "resistant", "cases", "this", "appears", "of", "levels",
         "were", "recorded", "was", "tested", "alone", "is", "a", "gene",
         "report", "nothing", "here", "treatment", "response", "whereas"}
    used_shingles: list[list[str]] = []

    def admit(name: str) -> bool:
        toks = normalize_surface(name).split()
        if any(t in used_tokens for t in toks):
            return False
        sh = shingles(name)
        if any(_jaccard(sh, prev) >= JACCARD_THRESHOLD - 0.1 for prev in used_shingles):
            return False
        used_tokens.update(toks)
        used_shingles.append(sh)
        return True

    def gen_drug() -> str:
        return (
            _DRUG_SYL[rng.randint(len(_DRUG_SYL))]
            + _DRUG_SYL[rng.randint(len(_DRUG_SYL))]
            + _DRUG_SUF[rng.randint(len(_DRUG_SUF))]
        )

    def gen_gene() -> str:
        return (
            "".join(rng.choice(_GENE_CON) for _ in range(3)).upper()
            + str(rng.randint(1, 99))
        )

    def gen_variant() -> str:
        return (
            rng.choice(_VAR_LET).upper()
            + str(rng.randint(100, 999))
            + rng.choice(_VAR_LET).upper()
        )

    for ent_type, gen, n in (("DRUG", gen_drug, 40), ("GENE", gen_gene, 40),
                             ("VARIANT", gen_variant, 40)):
        count = 0
        attempts = 0
        while count < n:
            attempts += 1
            if attempts > 10000:
                raise RuntimeError("entity generation failed to converge")
            name = gen()
            if not admit(name):
                continue
            surfaces = [name.capitalize() if ent_type == "DRUG" else name]
            # case alias
            if rng.rand() < 0.6:
                surfaces.append(name.upper() if surfaces[0] != name.upper() else name.lower())
            # punctuation alias (same compact form) for longer names
            if ent_type == "DRUG" and len(name) >= 6 and rng.rand() < 0.4:
                mid = len(name) // 2
                surfaces.append((name[:mid] + "-" + name[mid:]).capitalize())
            ent_id = f"{ent_type[0]}{count:03d}"
            entities.append(Entity(ent_id, ent_type, tuple(dict.fromkeys(surfaces))))
            count += 1
    return entities


def gazetteer_rows(entities: list[Entity]) -> list[dict]:
    """(surface_norm, ent_id, ent_type, snap_ts); one snapshot at BASE-30d
    covering everything, plus a later snapshot re-asserting DRUG rows (as-of
    join tests pick the right version)."""
    rows = []
    snap0 = _BASE_TS - timedelta(days=30)
    snap1 = _BASE_TS - timedelta(days=10)
    for e in entities:
        for s in e.surfaces:
            rows.append(
                {"surface_norm": normalize_surface(s), "ent_id": e.ent_id,
                 "ent_type": e.ent_type, "snap_ts": snap0}
            )
            if e.ent_type == "DRUG":
                rows.append(
                    {"surface_norm": normalize_surface(s), "ent_id": e.ent_id,
                     "ent_type": e.ent_type, "snap_ts": snap1}
                )
    # deterministic order + dedup
    seen = set()
    out = []
    for r in sorted(rows, key=lambda r: (r["surface_norm"], r["ent_id"], str(r["snap_ts"]))):
        k = (r["surface_norm"], r["ent_id"], r["snap_ts"])
        if k not in seen:
            seen.add(k)
            out.append(r)
    return out


def pred_rules_rows() -> list[dict]:
    return [
        {"subrel_a": f"{p}#a", "subrel_b": f"{p}#b", "pred_a": p, "pred_b": f"{p}.ctx"}
        for p in PRED_VOCAB
    ]


# ---------------------------------------------------------------- pages ----

def _esc(s: str, encode_slice: bool) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if encode_slice:
        # numeric character references must round-trip byte-identically
        s = s.replace("e", "&#101;", 1).replace("é", "&#233;")
    return s


def _render_html(title: str, sentences: list[str], encode_slice: bool) -> str:
    body = "".join(f"<p>{_esc(s, encode_slice)}</p>" for s in sentences)
    return (
        f"<html><head><title>{_esc(title, False)}</title></head>"
        f"<body>{body}</body></html>"
    )


def _pick(rng: np.random.RandomState, pool: list):
    return pool[rng.randint(len(pool))]


def _surface(rng: np.random.RandomState, e: Entity) -> str:
    return e.surfaces[rng.randint(len(e.surfaces))]


def _filler_sentence(rng: np.random.RandomState) -> str:
    n = rng.randint(4, 9)
    words = [_pick(rng, _FILLER) for _ in range(n)]
    if rng.rand() < 0.15:
        words[rng.randint(len(words))] = _pick(rng, _MULTIBYTE_FILLER)
    if rng.rand() < 0.2:
        words.append(_pick(rng, list(PRED_VOCAB)))  # pred without entities: no-op
    return " ".join(words) + "."


def generate_pages(n_pages: int = 2000, seed: int = SEED) -> dict:
    """Returns dict with keys: pages (list of row dicts), gazetteer,
    pred_rules, entities. Pages include dup urls, malformed/empty html,
    NULL rows, pre-filled-text rows, non-en rows, a hot domain."""
    rng = np.random.RandomState(seed)
    entities = make_entities(rng)
    drugs = [e for e in entities if e.ent_type == "DRUG"]
    genes = [e for e in entities if e.ent_type == "GENE"]
    variants = [e for e in entities if e.ent_type == "VARIANT"]

    domains = [f"site{j:02d}.example.org" for j in range(50)]
    hot_domain = "hot.example.org"

    pages: list[dict] = []

    def build_sentences(rng: np.random.RandomState) -> list[str]:
        sents: list[str] = []
        n_items = rng.randint(2, 6)
        for _ in range(n_items):
            roll = rng.rand()
            if roll < 0.22:  # n-ary, same sentence
                d, g, v, p = _pick(rng, drugs), _pick(rng, genes), _pick(rng, variants), _pick(rng, list(PRED_VOCAB))
                sents.append(
                    f"{_surface(rng, d)} {p} {_surface(rng, g)} in patients carrying {_surface(rng, v)}."
                )
            elif roll < 0.30:  # MULTI-predicate sentence: the sentence-initial
                # pred (p1) governs the gene clause, the pivot's own pred
                # (p2) sits next to it — nearest-predicate attachment must
                # pick p2 where a first-token rule would misassign p1
                d, g, v = _pick(rng, drugs), _pick(rng, genes), _pick(rng, variants)
                p1, p2 = _pick(rng, list(PRED_VOCAB)), _pick(rng, list(PRED_VOCAB))
                sents.append(
                    f"{_surface(rng, g)} {p1} treatment response whereas "
                    f"{_surface(rng, d)} {p2} {_surface(rng, v)} in cases."
                )
            elif roll < 0.50:  # n-ary, cross-sentence (adjacent)
                d, g, v, p = _pick(rng, drugs), _pick(rng, genes), _pick(rng, variants), _pick(rng, list(PRED_VOCAB))
                sents.append(f"{_surface(rng, d)} {p} {_surface(rng, g)} in resistant cases.")
                sents.append(f"This effect appears in patients carrying {_surface(rng, v)}.")
            elif roll < 0.62:  # distractor pair (no pivot type)
                g, v = _pick(rng, genes), _pick(rng, variants)
                sents.append(f"Expression of {_surface(rng, g)} varies with {_surface(rng, v)}.")
            elif roll < 0.72:  # far negative: path length 4 > max
                d, g, p = _pick(rng, drugs), _pick(rng, genes), _pick(rng, list(PRED_VOCAB))
                sents.append(f"{_surface(rng, d)} {p} nothing here.")
                sents.append(_filler_sentence(rng))
                sents.append(f"Levels of {_surface(rng, g)} were recorded.")
            elif roll < 0.82:  # single entity
                g = _pick(rng, genes)
                sents.append(f"{_surface(rng, g)} is a gene.")
            else:
                sents.append(_filler_sentence(rng))
        return sents

    for i in range(n_pages):
        domain = hot_domain if rng.rand() < 0.05 else _pick(rng, domains)
        url = f"https://{domain}/p/{i}"
        lang = "en" if rng.rand() < 0.90 else _pick(rng, ["de", "fr", "xx"])
        title = f"clinical report {i}"
        sents = build_sentences(rng)
        encode_slice = rng.rand() < 0.05
        html_str = _render_html(title, sents, encode_slice)

        roll = rng.rand()
        warc_ts = _BASE_TS + timedelta(seconds=int(rng.randint(0, 30 * 86400)))
        if roll < 0.01:  # NULL row (dropped-row accounting)
            pages.append({"url": url, "warc_ts": warc_ts, "html": None, "text": None, "lang": lang})
            continue
        if roll < 0.03:  # pre-filled text control slice (skip extraction path)
            text = extract_text(html_str.encode("utf-8"))
            pages.append({"url": url, "warc_ts": warc_ts, "html": None, "text": text, "lang": lang})
            continue
        if roll < 0.05:  # malformed: truncated html
            cut = max(20, int(len(html_str) * rng.rand()))
            html_b = html_str[:cut].encode("utf-8")
        elif roll < 0.07:  # latin-1 charset slice (no multibyte beyond latin-1)
            safe = html_str.replace("café", "cafe").replace("Müller", "Mueller").replace("naïve", "naive")
            html_b = safe.encode("latin-1")
        else:
            html_b = html_str.encode("utf-8")
        pages.append({"url": url, "warc_ts": warc_ts, "html": html_b, "text": None, "lang": lang})

        if rng.rand() < 0.03:  # duplicate url, later crawl, new content
            sents2 = build_sentences(rng)
            html2 = _render_html(title, sents2, False).encode("utf-8")
            pages.append(
                {"url": url, "warc_ts": warc_ts + timedelta(days=40), "html": html2,
                 "text": None, "lang": lang}
            )

    return {
        "pages": pages,
        "gazetteer": gazetteer_rows(entities),
        "pred_rules": pred_rules_rows(),
        "entities": entities,
    }


# --------------------------------------------------------------- goldens ----

def compute_goldens(
    corpus: dict,
    max_path_len: int = 3,
    co_mention_edges: bool = True,
    token_window: int | None = None,
    pred_attachment: str = "nearest",
) -> dict:
    """Plain-Python reference run over the generated pages: returns dicts of
    golden_text, golden_mentions, golden_evidence, golden_triples,
    golden_clusters — the exact semantics the Spark pipeline must reproduce.

    Enrichment params mirror kernels.bfs_evidence; token_window=None here
    means "use the kernel default" (the committed goldens are generated at
    the engine defaults — co-mention + TOKEN_WINDOW proximity edges ON).
    Pass co_mention_edges=False, token_window=-1 to simulate the BASE
    graph (used by tools/enrichment_delta.py to measure the P/R shift)."""
    from nary_relation_extraction_decomposed_spark.operators.kernels import (
        TOKEN_WINDOW,
    )

    if token_window is None:
        token_window = TOKEN_WINDOW
    tw = None if (token_window is not None and token_window < 0) else token_window
    pages = corpus["pages"]
    gaz_latest: dict[str, tuple[str, str]] = {}
    for r in corpus["gazetteer"]:
        gaz_latest.setdefault(r["surface_norm"], (r["ent_id"], r["ent_type"]))
    gaz = GazetteerIndex.build(
        [(s, e[0], e[1]) for s, e in gaz_latest.items()]
    )
    rules = {(r["subrel_a"], r["subrel_b"]): (r["pred_a"], r["pred_b"])
             for r in corpus["pred_rules"]}

    # Pipeline order (plans/pipeline.py): filter lang=en + has-content,
    # EXTRACT text for every surviving row, then dedup latest per url on the
    # extracted text (ties: warc_ts desc, text length desc, text desc).
    resolved: list[dict] = []
    for p in pages:
        if p["lang"] != "en" or (p["text"] is None and p["html"] is None):
            continue
        text = p["text"] if p["text"] is not None else extract_text(p["html"])
        resolved.append({"url": p["url"], "warc_ts": p["warc_ts"], "text": text})
    survivors: dict[str, dict] = {}
    for p in resolved:
        cur = survivors.get(p["url"])

        def _key(row):
            return (row["warc_ts"], len(row["text"]), row["text"])

        if cur is None or _key(p) > _key(cur):
            survivors[p["url"]] = p

    golden_text = []
    golden_mentions = []
    golden_evidence = []
    triple_urls: dict[tuple[str, str, str], set] = {}
    observed_surfaces: set[str] = set()

    for url in sorted(survivors):
        text = survivors[url]["text"]
        golden_text.append({"url": url, "text": text})
        ments = detect_mentions_in_text(text, gaz)
        for m in ments:
            golden_mentions.append({"url": url, **{k: m[k] for k in (
                "mention_id", "ent_id", "ent_type", "surface", "surface_norm",
                "begin", "end", "sent_id")}})
            observed_surfaces.add(m["surface_norm"])
        sents = sentence_predicates(text, frozenset(PRED_VOCAB))
        n_sents = len(sents)
        ev = bfs_evidence(
            n_sents, ments, PIVOT_TYPE, list(ARG_SLOTS), max_path_len,
            co_mention_edges=co_mention_edges, token_window=tw,
            sent_tok_counts=[s["n_tokens"] for s in sents],
        )
        for r in ev:
            golden_evidence.append(
                {"url": url, "m1": r["pivot_mid"], "m2": r["other_mid"],
                 "slot": r["slot"], "path_len": r["path_len"]}
            )
        # subrels + rejoin (sim of the DataFrame joins); the predicate is
        # attached per PIVOT MENTION — nearest vocab token to the pivot's
        # span (kernels.nearest_pred), not the sentence's first
        by_mid = {m["mention_id"]: m for m in ments}
        preds_of_sent = {
            s["sent_id"]: (s["preds"], s["pred_toks"]) for s in sents
        }
        subrels = []
        for r in ev:
            pm = by_mid[r["pivot_mid"]]
            sp = preds_of_sent.get(pm["sent_id"])
            if sp is None:
                pred = None
            elif pred_attachment == "first":  # pre-round-4 rule, kept so
                # tools/predicate_delta.py can measure the attachment shift
                pred = sp[0][0] if len(sp[0]) else None
            else:
                pred = nearest_pred(sp[0], sp[1], pm["tok_begin"], pm["tok_end"])
            if pred is None:
                continue
            subrels.append(
                {"pivot_mid": r["pivot_mid"], "pivot_norm": pm["surface_norm"],
                 "other_norm": by_mid[r["other_mid"]]["surface_norm"],
                 "slot": r["slot"], "pred": pred,
                 "subrel": f"{pred}#{r['slot']}"}
            )
        for a in subrels:
            if a["slot"] != "a":
                continue
            for b in subrels:
                if b["slot"] != "b" or b["pivot_mid"] != a["pivot_mid"] or b["pred"] != a["pred"]:
                    continue
                rule = rules.get((a["subrel"], b["subrel"]))
                if rule is None:
                    continue
                pa, pb = rule
                for subj, pred, obj in (
                    (a["pivot_norm"], pa, a["other_norm"]),
                    (a["pivot_norm"], pb, b["other_norm"]),
                ):
                    triple_urls.setdefault((subj, pred, obj), set()).add(url)

    # ER golden: exact-jaccard >= threshold components over observed surfaces
    surfaces = sorted(observed_surfaces)
    parent = {s: s for s in surfaces}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    sh = {s: shingles(s) for s in surfaces}
    for i, a in enumerate(surfaces):
        for b in surfaces[i + 1:]:
            if _jaccard(sh[a], sh[b]) >= JACCARD_THRESHOLD:
                union(a, b)
    comp: dict[str, list[str]] = {}
    for s in surfaces:
        comp.setdefault(find(s), []).append(s)
    canon = {}
    golden_clusters = []
    for root, members in sorted(comp.items()):
        label = min(members)
        for m in members:
            canon[m] = label
            golden_clusters.append({"surface_norm": m, "canonical": label})

    golden_triples = {}
    for (subj, pred, obj), urls in triple_urls.items():
        key = (canon.get(subj, subj), pred, canon.get(obj, obj))
        golden_triples[key] = golden_triples.get(key, set()) | urls
    golden_triples_rows = [
        {"subj": k[0], "pred": k[1], "obj": k[2], "support": len(v)}
        for k, v in sorted(golden_triples.items())
    ]

    return {
        "golden_text": golden_text,
        "golden_mentions": golden_mentions,
        "golden_evidence": golden_evidence,
        "golden_triples": golden_triples_rows,
        "golden_clusters": golden_clusters,
    }
