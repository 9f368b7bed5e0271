"""Build dist/nary_kg.zip for spark-submit --py-files (BASELINE.json launch
contract). Deterministic: fixed entry order, zeroed timestamps — the same
tree always produces byte-identical zips (resume-friendly artifact hashing).

Usage: python tools/build_dist.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "nary_relation_extraction_decomposed_spark"
OUT = os.path.join(REPO, "dist", "nary_kg.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    print(f"wrote {OUT} ({len(entries)} modules)")


if __name__ == "__main__":
    main()
