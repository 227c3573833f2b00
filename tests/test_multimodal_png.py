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


def _pack_row(samples, bit_depth: int) -> bytes:
    """Pack one scanline of integer samples at the given depth
    (MSB-first for sub-byte depths, big-endian for 16-bit)."""
    if bit_depth == 16:
        return b"".join(struct.pack(">H", int(s)) for s in samples)
    if bit_depth == 8:
        return bytes(int(s) for s in samples)
    per_byte = 8 // bit_depth
    out = bytearray()
    for i in range(0, len(samples), per_byte):
        byte = 0
        for k, s in enumerate(samples[i : i + per_byte]):
            byte |= int(s) << ((per_byte - 1 - k) * bit_depth)
        out.append(byte)
    return bytes(out)


ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(
    pixels: np.ndarray,
    filters=None,
    bit_depth: int = 8,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal PNG encoder: pixels is (h, w) gray/indices or (h, w, ch)
    with ch in {1, 2, 3, 4}; `filters` picks the per-row filter type.
    With `palette`, pixels are (h, w) palette indices (color type 3);
    `bit_depth` supports 1/2/4/8/16 where the spec allows. With
    `interlace`, scanlines are stored as the seven Adam7 passes
    (each pass filtered independently, empty passes omitted)."""
    paletted = palette is not None
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = 3 if paletted else {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, int(interlace))
    bpp = max(1, ch * bit_depth // 8)
    raw = bytearray()
    if interlace:
        blocks = [
            pixels[y0::dy, x0::dx] for x0, y0, dx, dy in ADAM7
        ]
        blocks = [b for b in blocks if b.shape[0] and b.shape[1]]
    else:
        blocks = [pixels]
    for block in blocks:
        bh, bw = block.shape[0], block.shape[1]
        prev = bytes((bw * ch * bit_depth + 7) // 8)
        for y in range(bh):
            line = _pack_row(block[y].reshape(-1).tolist(), bit_depth)
            f = (filters or [0])[y % len(filters or [0])]
            raw.append(f)
            raw += _filter_row(f, line, prev, bpp)
            prev = line
    chunks = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if paletted:
        chunks += _chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    return chunks + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


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


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_paletted_png_sums_palette_rgb(spark, depth):
    """Color type 3 (VERDICT r5 item 5): pixels are PLTE indices; the
    decoded pixel sum is sum(r+g+b) of each pixel's palette entry."""
    rng = np.random.default_rng(depth)
    n_entries = 1 << depth
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(n_entries)]
    idx = rng.integers(0, n_entries, size=(11, 7))
    got = _decode(
        spark, [encode_png(idx, filters=[0, 1, 2, 3, 4], bit_depth=depth,
                           palette=palette)]
    )[0]
    assert (got.width, got.height) == (7, 11)
    want = sum(sum(palette[i]) for i in idx.reshape(-1))
    assert got.byte_sum == want


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_16bit_png_sums_full_samples(spark, channels):
    """16-bit depth (VERDICT r5 item 5): big-endian sample pairs; the
    pixel sum counts full 16-bit values, exercising all five filters
    with the 2-byte-per-sample filter offset."""
    rng = np.random.default_rng(20 + channels)
    px = rng.integers(0, 65536, size=(9, 6, channels))
    got = _decode(spark, [encode_png(px, filters=[0, 1, 2, 3, 4], bit_depth=16)])[0]
    assert (got.width, got.height) == (6, 9)
    assert got.byte_sum == int(px.astype(np.int64).sum())


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_png(spark, depth):
    """Sub-byte grayscale: MSB-first bit packing with row-end padding
    (width chosen to not divide evenly into bytes)."""
    rng = np.random.default_rng(30 + depth)
    px = rng.integers(0, 1 << depth, size=(5, 13))
    got = _decode(spark, [encode_png(px, filters=[0, 2], bit_depth=depth)])[0]
    assert (got.width, got.height) == (13, 5)
    assert got.byte_sum == int(px.astype(np.int64).sum())


@pytest.mark.parametrize(
    "shape", [(16, 16), (13, 9), (7, 5), (4, 4), (3, 11), (1, 1), (2, 2)]
)
def test_interlaced_png_decodes(spark, shape):
    """Adam7 (round 6): every pass decodes independently; dims below 8
    exercise EMPTY passes (which emit no scanlines at all)."""
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    got = _decode(spark, [encode_png(px, filters=[0, 1, 2, 3, 4], interlace=True)])[0]
    assert (got.width, got.height) == (shape[1], shape[0])
    assert got.byte_sum == int(px.astype(np.int64).sum())


def test_interlaced_16bit_and_paletted(spark):
    rng = np.random.default_rng(77)
    px16 = rng.integers(0, 65536, size=(10, 6, 2))
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(16)]
    idx = rng.integers(0, 16, size=(9, 5))
    got = _decode(
        spark,
        [
            encode_png(px16, filters=[4, 3], bit_depth=16, interlace=True),
            encode_png(idx, filters=[0, 2], bit_depth=4, palette=palette,
                       interlace=True),
        ],
    )
    assert got[0].byte_sum == int(px16.astype(np.int64).sum())
    assert got[1].byte_sum == sum(sum(palette[i]) for i in idx.reshape(-1))


def test_interlace_flag_on_sequential_stream_falls_back(spark):
    """An interlace=1 IHDR over a NON-interlaced scanline stream is
    malformed (stream length can't match the Adam7 pass layout) — it
    must take the byte-stats tier, not a wrong decode."""
    px = np.full((4, 4), 9, dtype=np.uint8)
    good = encode_png(px)
    # flip the IHDR interlace byte (last IHDR payload byte) + fix CRC
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    patched = good[:8] + _chunk(b"IHDR", ihdr) + good[8 + 12 + 13:]
    got = _decode(spark, [patched])[0]
    assert got.byte_sum == sum(patched)  # fallback, not a decode


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
