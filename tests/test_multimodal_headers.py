"""Dependency-free media header parses (the REAL metadata path of the
multimodal plumbing): hand-built PNG/JPEG/WAV byte fixtures, malformed
variants, and the distributed mapInPandas surface carrying the parsed
values end to end."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F

from nary_relation_extraction_decomposed_spark.operators.multimodal import (
    extract_media_features,
    parse_jpeg_size,
    parse_media_header,
    parse_png_size,
    parse_wav_meta,
)


def png_bytes(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def jpeg_bytes(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def wav_bytes(rate: int, channels: int, n_samples: int, bits: int = 16) -> bytes:
    block = channels * bits // 8
    byte_rate = rate * block
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block, bits)
    body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_header():
    assert parse_png_size(png_bytes(640, 480)) == (640, 480)
    assert parse_png_size(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) is None
    assert parse_png_size(b"not a png at all") is None
    assert parse_png_size(png_bytes(0, 10)) is None  # zero dim rejected


def test_jpeg_header():
    assert parse_jpeg_size(jpeg_bytes(1024, 768)) == (1024, 768)
    # progressive (SOF2) frames parse too
    prog = jpeg_bytes(64, 32).replace(b"\xff\xc0", b"\xff\xc2")
    assert parse_jpeg_size(prog) == (64, 32)
    assert parse_jpeg_size(b"\xff\xd8\xff\xd9") is None  # no frame marker
    assert parse_jpeg_size(b"\x89PNG") is None
    assert parse_jpeg_size(jpeg_bytes(100, 50)[:6]) is None  # truncated


def test_wav_header():
    rate, ch, dur = parse_wav_meta(wav_bytes(16000, 1, 16000))
    assert (rate, ch, dur) == (16000, 1, 1000)  # 16k samples @16kHz = 1s
    rate, ch, dur = parse_wav_meta(wav_bytes(44100, 2, 22050))
    assert (rate, ch, dur) == (44100, 2, 500)
    assert parse_wav_meta(b"RIFFxxxxNOPE") is None
    assert parse_wav_meta(b"") is None


def test_parse_media_header_dispatch():
    h = parse_media_header(png_bytes(8, 9))
    assert (h["width"], h["height"], h["sample_rate"]) == (8, 9, None)
    h = parse_media_header(wav_bytes(8000, 1, 4000))
    assert (h["width"], h["sample_rate"], h["duration_ms"]) == (None, 8000, 500)
    h = parse_media_header(b"plain text payload")
    assert all(v is None for v in h.values())


def test_media_features_carry_real_metadata(spark):
    """The mapInPandas surface must deliver the parsed header values (not
    the fake-decode stand-ins) for parseable containers, typed per
    FEATURES_SCHEMA, NULL sample_rate for images and vice versa."""
    rows = [
        (1, "img", bytearray(png_bytes(320, 200)), None),
        (2, "img", bytearray(jpeg_bytes(100, 60)), None),
        (3, "aud", bytearray(wav_bytes(16000, 1, 8000)), None),
        (4, "txt", bytearray(b"just text"), None),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary, meta map<string,string>"
    )
    got = {r["media_id"]: r for r in
           extract_media_features(media, fake_decode=True).collect()}
    assert (got[1]["width"], got[1]["height"]) == (320, 200)
    assert got[1]["kind"] == "image/png" and got[1]["sample_rate"] is None
    assert (got[2]["width"], got[2]["height"]) == (100, 60)
    assert got[2]["kind"] == "image/jpeg"
    assert (got[3]["sample_rate"], got[3]["duration_ms"]) == (16000, 500)
    assert got[3]["kind"] == "audio/wav"
    assert got[4]["sample_rate"] is None and got[4]["duration_ms"] is None
    for r in got.values():
        assert len(r["feat"]) == 8  # stub features still flow


def gif_bytes(w: int, h: int) -> bytes:
    import struct as _s
    return b"GIF89a" + _s.pack("<HH", w, h) + b"\x00\x00\x00"


def mp4_bytes(timescale: int, duration: int, version: int = 0) -> bytes:
    import struct as _s
    if version == 0:
        mvhd = b"\x00\x00\x00\x00" + b"\x00" * 8 + _s.pack(">II", timescale, duration)
    else:
        mvhd = b"\x01\x00\x00\x00" + b"\x00" * 16 + _s.pack(">I", timescale) + _s.pack(">Q", duration)
    mvhd_box = _s.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = _s.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    ftyp = _s.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_gif_and_mp4_headers():
    """r5 formats: GIF logical-screen-descriptor dims (LE), MP4 moov/mvhd
    duration (BE; v0 4-byte and v1 8-byte duration), sniffing at offset 4
    for the ISO BMFF family, and total None on malformed/torn boxes."""
    from nary_relation_extraction_decomposed_spark.operators.multimodal import (
        parse_gif_size,
        parse_mp4_duration,
        parse_media_header,
        sniff_kind,
    )

    assert parse_gif_size(gif_bytes(320, 240)) == (320, 240)
    assert sniff_kind(gif_bytes(1, 1)) == "image/gif"
    assert parse_gif_size(b"GIF89a\x00\x00\x01\x00\x00\x00\x00") is None  # w=0
    assert parse_gif_size(b"GIF00a" + b"\x01\x00\x01\x00\x00") is None
    assert parse_gif_size(b"GIF89a\x01") is None  # truncated

    p = mp4_bytes(600, 1200)
    assert sniff_kind(p) == "video/mp4"
    assert parse_mp4_duration(p) == 2000
    assert parse_mp4_duration(mp4_bytes(1000, 90001)) == 90001
    # v1: 64-bit duration
    assert parse_mp4_duration(mp4_bytes(1000, 5_000_000_000, version=1)) == 5_000_000_000
    # torn box (declared size beyond payload) and zero timescale -> None
    assert parse_mp4_duration(p[:-4]) is None
    assert parse_mp4_duration(mp4_bytes(0, 100)) is None
    assert parse_mp4_duration(b"\x00\x00\x00\x08ftyp") is None  # no moov

    h = parse_media_header(gif_bytes(12, 34))
    assert (h["width"], h["height"], h["duration_ms"]) == (12, 34, None)
    h = parse_media_header(mp4_bytes(500, 250))
    assert (h["width"], h["duration_ms"]) == (None, 500)
