"""Measure the triple-set P/R delta of the doc-graph enrichment.

Computes goldens twice over the committed fixture corpus (pure Python,
shared kernels — no Spark): BASE graph (sentence chain only) vs ENRICHED
(co-mention + token-window proximity edges, the engine default), and
reports precision/recall of the enriched triple set against the base set
plus the evidence-row delta. The committed goldens are the ENRICHED run;
this records what the default change did (VERDICT r2 directive #1).

Usage: python tools/enrichment_delta.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.corpus import SEED, compute_goldens, generate_pages  # noqa: E402


def main(n_pages: int = 2000) -> None:
    corpus = generate_pages(n_pages=n_pages, seed=SEED)
    base = compute_goldens(corpus, co_mention_edges=False, token_window=-1)
    rich = compute_goldens(corpus)  # engine defaults

    b = {(r["subj"], r["pred"], r["obj"]) for r in base["golden_triples"]}
    r = {(r["subj"], r["pred"], r["obj"]) for r in rich["golden_triples"]}
    tp = len(b & r)
    print(json.dumps({
        "n_pages": n_pages,
        "base_triples": len(b),
        "enriched_triples": len(r),
        "precision_vs_base": round(tp / len(r), 4) if r else None,
        "recall_vs_base": round(tp / len(b), 4) if b else None,
        "new_triples": len(r - b),
        "lost_triples": len(b - r),
        "base_evidence_rows": len(base["golden_evidence"]),
        "enriched_evidence_rows": len(rich["golden_evidence"]),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
