"""Measure the triple-set delta of nearest-predicate attachment.

Computes goldens twice over the fixture corpus (pure Python, shared
kernels — no Spark): FIRST-token predicate rule (rounds 1-3: every pivot in
a sentence inherits the sentence-initial pred token) vs NEAREST-predicate
attachment (round 4 default: each pivot attaches to the vocab token closest
to its own span — the dependency-free proxy for governing-verb attachment,
VERDICT r3 directive #4). Reports how many triples changed predicate and
the multi-predicate sentence exposure.

Usage: python tools/predicate_delta.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.corpus import SEED, compute_goldens, generate_pages  # noqa: E402
from nary_relation_extraction_decomposed_spark.operators.kernels import (  # noqa: E402
    sentence_predicates,
)


def main(n_pages: int = 2000) -> None:
    corpus = generate_pages(n_pages=n_pages, seed=SEED)
    first = compute_goldens(corpus, pred_attachment="first")
    near = compute_goldens(corpus)  # engine default

    f = {(r["subj"], r["pred"], r["obj"]) for r in first["golden_triples"]}
    n = {(r["subj"], r["pred"], r["obj"]) for r in near["golden_triples"]}

    # multi-predicate sentence exposure in the corpus
    vocab = frozenset(("inhibits", "activates", "binds", "modulates"))
    n_sents = 0
    n_multi = 0
    seen_urls = set()
    for p in corpus["pages"]:
        if p["lang"] != "en" or p["html"] is None or p["url"] in seen_urls:
            continue
        seen_urls.add(p["url"])
        from nary_relation_extraction_decomposed_spark.extract.html import (
            extract_text,
        )

        for s in sentence_predicates(extract_text(p["html"]), vocab):
            n_sents += 1
            if len(s["preds"]) > 1:
                n_multi += 1

    print(json.dumps({
        "n_pages": n_pages,
        "first_rule_triples": len(f),
        "nearest_rule_triples": len(n),
        "shared": len(f & n),
        "reassigned_new": len(n - f),
        "reassigned_lost": len(f - n),
        "multi_pred_sentences": n_multi,
        "sentences": n_sents,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
