"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark side is REAL and tested: schemas, Arrow batch shapes, mapInPandas
signatures, partition-friendly layout. The codec step is STUBBED (no
image/audio libraries ship in this container): decode_image raises
NotImplementedError unless a deterministic fake decoder is requested —
exactly the seam where PIL/ffmpeg drops in at deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, meta map<string,string>"
)
FEATURES_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, magic string, "
    "width int, height int, feat array<double>"
)

_MAGIC_KINDS = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
}


def sniff_kind(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, kind in _MAGIC_KINDS.items():
        if payload[: len(magic)] == magic:
            return kind
    return "application/octet-stream"


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, list[float]]:
    """STUB: returns (width, height, features). Real codecs are not in this
    container; `fake=True` gives a deterministic byte-histogram stand-in so
    the distributed plumbing is fully testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL/libvips) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    w = 1 + payload[0] if payload else 0
    h = 1 + payload[-1] if payload else 0
    hist = [0.0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1.0
    total = sum(hist) or 1.0
    return w, h, [round(x / total, 6) for x in hist]


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """media (MEDIA_SCHEMA) -> FEATURES_SCHEMA via mapInPandas: metadata is
    always real (length, magic sniff); pixel decode goes through the stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("media_id", "kind", "n_bytes", "magic", "width", "height", "feat")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["kind"].append(sniff_kind(p))
                out["n_bytes"].append(len(p))
                out["magic"].append(p[:4].hex())
                w, h, feat = decode_image(p, fake=fake_decode)
                out["width"].append(w)
                out["height"].append(h)
                out["feat"].append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "kind": pd.Series(out["kind"], dtype=object),
                    "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                    "magic": pd.Series(out["magic"], dtype=object),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "feat": pd.Series(out["feat"], dtype=object),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media-shaped table derived from text docs (test stand-in
    for a real image/audio corpus): payload = UTF-8 bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
