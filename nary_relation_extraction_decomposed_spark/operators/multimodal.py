"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark side is REAL and tested: schemas, Arrow batch shapes, mapInPandas
signatures, partition-friendly layout. METADATA is also real: pure-Python,
dependency-free header parses extract width/height from PNG IHDR, JPEG
SOFn markers and the GIF logical screen descriptor, sample-rate/channels/
duration from WAV fmt/data chunks, and duration from the MP4 (ISO BMFF)
moov/mvhd box (tests/test_multimodal_headers.py runs them over hand-built
byte fixtures). Only PIXEL decode is stubbed (no image/audio libraries ship in
this container): decode_image raises NotImplementedError unless the
deterministic fake decoder is requested — exactly the seam where
PIL/ffmpeg drops in at deployment.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, meta map<string,string>"
)
FEATURES_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, magic string, "
    "width int, height int, sample_rate int, duration_ms int, "
    "feat array<double>"
)

_MAGIC_KINDS = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
    b"GIF8": "image/gif",
}


def sniff_kind(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, kind in _MAGIC_KINDS.items():
        if payload[: len(magic)] == magic:
            return kind
    # ISO BMFF (MP4 family): the magic sits at offset 4 ('ftyp' box type)
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def parse_png_size(p: bytes) -> tuple[int, int] | None:
    """Width/height from the IHDR chunk (PNG spec: 8-byte signature, then
    length+\"IHDR\"+width(4,BE)+height(4,BE)). Total: returns None on
    anything malformed."""
    if len(p) < 24 or p[:8] != b"\x89PNG\r\n\x1a\n" or p[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", p[16:24])
    return (w, h) if 0 < w < 1 << 24 and 0 < h < 1 << 24 else None


def parse_jpeg_size(p: bytes) -> tuple[int, int] | None:
    """Width/height from the first SOFn frame marker (JPEG: FFD8, then
    FF-marked segments with 2-byte big-endian lengths; SOF0/1/2/3/5/6/7/
    9/10/11/13/14/15 carry precision(1)+height(2)+width(2))."""
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    i = 2
    sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
           0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            return None  # desynced — bail rather than scan garbage
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers, no length
            continue
        if i + 4 > len(p):
            return None
        seglen = struct.unpack(">H", p[i + 2:i + 4])[0]
        if marker in sof:
            if i + 9 > len(p) or seglen < 7:
                return None
            h, w = struct.unpack(">HH", p[i + 5:i + 9])
            return (w, h) if w > 0 and h > 0 else None
        if marker == 0xDA:  # start of scan — no SOF seen before it
            return None
        i += 2 + seglen
    return None


def parse_gif_size(p: bytes) -> tuple[int, int] | None:
    """Width/height from the GIF logical screen descriptor (GIF87a/89a
    signature, then width(2,LE)+height(2,LE)). Total: None on malformed."""
    if len(p) < 10 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", p[6:10])
    return (w, h) if w > 0 and h > 0 else None


def parse_mp4_duration(p: bytes) -> int | None:
    """duration_ms from the ISO BMFF moov/mvhd box (MP4 family): top-level
    boxes are size(4,BE)+type(4); mvhd (inside moov) carries
    version(1)+flags(3)+ctime+mtime+timescale(4,BE)+duration(4 or 8, BE
    by version). Walks declared box sizes only — total, None on anything
    malformed, no codec work."""
    if len(p) < 8 or p[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, depth: int) -> int | None:
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", p[i:i + 4])[0]
            btype = p[i + 4:i + 8]
            if size < 8 or i + size > hi:
                return None  # torn/lying box — bail, never scan garbage
            if btype == b"moov" and depth == 0:
                return walk(i + 8, i + size, 1)
            if btype == b"mvhd" and depth == 1:
                body = i + 8
                if body + 4 > hi:
                    return None
                version = p[body]
                if version == 0:
                    # v0: ctime(4)+mtime(4)+timescale(4)+duration(4)
                    if body + 20 > i + size:
                        return None
                    ts, dur = struct.unpack(">II", p[body + 12:body + 20])
                else:
                    # v1: ctime(8)+mtime(8)+timescale(4)+duration(8)
                    if body + 32 > i + size:
                        return None
                    ts = struct.unpack(">I", p[body + 20:body + 24])[0]
                    dur = struct.unpack(">Q", p[body + 24:body + 32])[0]
                if ts <= 0:
                    return None
                return int(dur * 1000 // ts)
            i += size
        return None

    return walk(0, len(p), 0)


def parse_wav_meta(p: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, channels, duration_ms) from RIFF/WAVE fmt + data
    chunks (all little-endian; duration = data bytes / byte_rate)."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i = 12
    rate = channels = byte_rate = None
    data_len = None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        clen = struct.unpack("<I", p[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(p):
            channels, rate = struct.unpack("<HI", p[i + 10:i + 16])
            byte_rate = struct.unpack("<I", p[i + 16:i + 20])[0]
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not rate or not byte_rate or data_len is None:
        return None
    return rate, channels or 0, int(data_len * 1000 // byte_rate)


def parse_media_header(payload: bytes) -> dict:
    """Dependency-free typed metadata for the supported container formats:
    {width, height, sample_rate, duration_ms} with None where the format
    doesn't carry the field (or the header is unparseable)."""
    out = {"width": None, "height": None, "sample_rate": None, "duration_ms": None}
    wh = parse_png_size(payload) or parse_jpeg_size(payload) or parse_gif_size(payload)
    if wh:
        out["width"], out["height"] = wh
        return out
    wav = parse_wav_meta(payload)
    if wav:
        out["sample_rate"], _, out["duration_ms"] = wav
        return out
    dur = parse_mp4_duration(payload)
    if dur is not None:
        out["duration_ms"] = dur
    return out


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
    """media (MEDIA_SCHEMA) -> FEATURES_SCHEMA via mapInPandas. Metadata is
    REAL: length, magic sniff, and the dependency-free header parses
    (PNG/JPEG width+height, WAV sample_rate+duration_ms). Only the pixel
    feature vector goes through the decode stub; for parsed containers the
    stub's fake w/h is overridden by the genuine header values."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "kind", "n_bytes", "magic", "width", "height",
                "sample_rate", "duration_ms", "feat")
        for pdf in it:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["kind"].append(sniff_kind(p))
                out["n_bytes"].append(len(p))
                out["magic"].append(p[:4].hex())
                hdr = parse_media_header(p)
                w, h, feat = decode_image(p, fake=fake_decode)
                out["width"].append(hdr["width"] if hdr["width"] is not None else w)
                out["height"].append(hdr["height"] if hdr["height"] is not None else h)
                out["sample_rate"].append(hdr["sample_rate"])
                out["duration_ms"].append(hdr["duration_ms"])
                out["feat"].append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "kind": pd.Series(out["kind"], dtype=object),
                    "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                    "magic": pd.Series(out["magic"], dtype=object),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "duration_ms": pd.Series(out["duration_ms"], dtype="Int32"),
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
