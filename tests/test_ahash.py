"""Perceptual average-hash over really-decoded PNG pixels + the banded
Hamming near-dup join (multimodal.image_ahash / ahash_near_pairs).

Hand-encoded PNGs with known pixel content prove the decode->hash path;
a brightness-shifted re-encode of the same image must land within the
banded join's Hamming radius while an unrelated image must not.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from etl_pipline_ibrd_loan_system_spark.operators import multimodal


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _rgb_png(pixels) -> bytes:
    """Minimal RGB8 non-interlaced encoder, filter type 0 rows."""
    h, w = len(pixels), len(pixels[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _gradient(shift: int = 0, w: int = 32, h: int = 32):
    return [
        [((6 * x + shift) % 200, (6 * y + shift) % 200, 10) for x in range(w)]
        for y in range(h)
    ]


def _checker(w: int = 32, h: int = 32):
    return [
        [(200, 200, 200) if (x // 4 + y // 4) % 2 else (10, 10, 10)
         for x in range(w)]
        for y in range(h)
    ]


@pytest.fixture(scope="module")
def hashed(spark):
    rows = [
        (1, bytearray(_rgb_png(_gradient(0)))),
        (2, bytearray(_rgb_png(_gradient(3)))),   # slight shift: near-dup
        (3, bytearray(_rgb_png(_checker()))),      # unrelated image
        (4, bytearray(b"not a png at all" * 10)),  # byte-stats tier
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    out = multimodal.image_ahash(df)
    return {r["media_id"]: r for r in out.collect()}, out


def test_tiers(hashed):
    by_id, _ = hashed
    assert [by_id[i]["tier"] for i in (1, 2, 3)] == ["png"] * 3
    assert by_id[4]["tier"] == "bytes"


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_similar_images_close_unrelated_far(hashed):
    by_id, _ = hashed
    near = _ham(by_id[1]["ahash"], by_id[2]["ahash"])
    far = _ham(by_id[1]["ahash"], by_id[3]["ahash"])
    assert near <= 7, f"shifted copy drifted {near} bits"
    assert far > 7, f"unrelated image only {far} bits away"


def test_deterministic(spark):
    payload = bytearray(_rgb_png(_gradient(0)))
    df = spark.createDataFrame(
        [(1, payload), (2, payload)], "media_id bigint, data binary"
    )
    got = {r["media_id"]: r["ahash"] for r in multimodal.image_ahash(df).collect()}
    assert got[1] == got[2]


def test_banded_near_pairs(hashed):
    _, out = hashed
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.ahash_near_pairs(out, max_hamming=7).collect()
    }
    assert (1, 2) in pairs
    assert all(k == (1, 2) for k in pairs), f"false positives: {pairs}"
