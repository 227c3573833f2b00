"""Real PNG decode path in decode_media (VERDICT r4 item 5).

A hand-rolled stdlib PNG *encoder* produces images with known pixel
content across color types (gray / RGB / RGBA) and ALL five PNG filter
types; decode_media must recover the IHDR dimensions and the exact
pixel sum through the Arrow mapInPandas path. Non-PNG payloads and
undecodable PNG variants must keep the byte-stats tier.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_pipline_ibrd_loan_system_spark.operators import multimodal


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward PNG filter (spec 9.2) — what an encoder stores."""
    out = bytearray()
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            f = x
        elif ftype == 1:
            f = (x - a) & 0xFF
        elif ftype == 2:
            f = (x - b) & 0xFF
        elif ftype == 3:
            f = (x - ((a + b) >> 1)) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f = (x - pr) & 0xFF
        out.append(f)
    return bytes(out)


def encode_png(pixels: np.ndarray, filters=None) -> bytes:
    """Minimal PNG encoder: pixels is (h, w) gray or (h, w, ch) with
    ch in {1, 2, 3, 4}; `filters` picks the per-row filter type."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    bpp = ch
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        line = pixels[y].astype(np.uint8).tobytes()
        f = (filters or [0])[y % len(filters or [0])]
        raw.append(f)
        raw += _filter_row(f, line, prev, bpp)
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _decode(spark, payloads):
    rows = [
        (i, bytearray(p), ("png", 1, 1, 1, 16000)) for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(
        rows, f"media_id bigint, data binary, meta {multimodal.MEDIA_META}"
    )
    out = multimodal.decode_media(df).collect()
    return {r.media_id: r for r in sorted(out, key=lambda r: r.media_id)}


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_pixel_sum_and_dims(spark, channels):
    rng = np.random.default_rng(channels)
    px = rng.integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
    got = _decode(spark, [encode_png(px, filters=[0, 1, 2, 3, 4])])[0]
    assert (got.width, got.height) == (9, 13)
    assert got.byte_sum == int(px.astype(np.int64).sum())  # true pixel sum


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_roundtrips(spark, ftype):
    rng = np.random.default_rng(10 + ftype)
    px = rng.integers(0, 256, size=(6, 17, 3), dtype=np.uint8)
    got = _decode(spark, [encode_png(px, filters=[ftype])])[0]
    assert got.byte_sum == int(px.astype(np.int64).sum())


def test_non_png_payload_keeps_byte_stats_tier(spark):
    payload = b"just text, not an image"
    got = _decode(spark, [payload])[0]
    assert got.n_bytes == len(payload)
    assert got.byte_sum == sum(payload)
    assert (got.width, got.height) == (1, 1)  # meta passthrough


def test_corrupt_png_falls_back_not_throws(spark):
    px = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(px)
    corrupt = good[:40] + b"\x00" * 10 + good[50:]  # trash the IDAT
    got = _decode(spark, [corrupt])[0]
    assert got.byte_sum == sum(corrupt)  # byte-stats tier, no crash


def test_mixed_batch_png_and_text(spark):
    px = np.full((3, 5), 7, dtype=np.uint8)
    got = _decode(spark, [encode_png(px), b"plain"])
    assert got[0].byte_sum == 7 * 15 and got[0].width == 5
    assert got[1].byte_sum == sum(b"plain")
