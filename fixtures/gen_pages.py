"""Write the KG fixture corpus + goldens to tests/fixtures/data/ as parquet.

Usage: python fixtures/gen_pages.py [n_pages] [out_dir]
Pure function of (n_pages, seed=42); regenerating overwrites byte-for-byte
equivalent content. Committed outputs are the pytest goldens (FIXTURES.md).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.corpus import SEED, compute_goldens, generate_pages  # noqa: E402

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _write(rows: list[dict], path: str, schema: pa.Schema | None = None) -> None:
    if schema is None:
        table = pa.Table.from_pylist(rows)
    else:
        table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path)


def main(n_pages: int = 2000, out_dir: str | None = None) -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    out = out_dir or os.path.join(os.path.dirname(here), "tests", "fixtures", "data")
    os.makedirs(out, exist_ok=True)

    corpus = generate_pages(n_pages=n_pages, seed=SEED)
    goldens = compute_goldens(corpus)

    _write(corpus["pages"], os.path.join(out, "pages.parquet"), PAGES_SCHEMA)
    _write(corpus["gazetteer"], os.path.join(out, "gazetteer.parquet"))
    _write(corpus["pred_rules"], os.path.join(out, "pred_rules.parquet"))
    for name in ("golden_text", "golden_mentions", "golden_evidence",
                 "golden_triples", "golden_clusters"):
        _write(goldens[name], os.path.join(out, f"{name}.parquet"))
    print(f"wrote {len(corpus['pages'])} pages + goldens to {out}")
    print({k: len(v) for k, v in goldens.items()})


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    d = sys.argv[2] if len(sys.argv) > 2 else None
    main(n, d)
