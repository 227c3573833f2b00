"""JPEG / GIF / BMP decode tiers of operators/multimodal.py, proven
against hand-encoded byte streams (no imaging library anywhere):

  * JPEG — structural tier: SOFn frame-header dimensions out of a
    hand-built marker stream (baseline and progressive), raw-payload
    byte sum; truncated/markerless payloads fall back.
  * GIF — FULL decode: hand-driven LZW encoding (clear-code-per-pixel,
    a valid if inefficient stream every conformant decoder accepts),
    palette r+g+b pixel sums, local palettes, multi-frame animations,
    the interlace flag.
  * BMP — FULL decode: BI_RGB 24-bit with stride padding, 8-bit
    palette, 32-bit BGRX with alpha excluded, top-down negative height.
"""

from __future__ import annotations

import struct

from etl_pipline_ibrd_loan_system_spark.operators.multimodal import decode_media

META = {"fmt": "bin", "width": 7, "height": 9, "n_frames": 1, "sample_rate": 0}


def _decode_one(spark, payload: bytes):
    df = spark.createDataFrame(
        [(1, bytearray(payload), META)],
        "media_id bigint, data binary, "
        "meta struct<fmt:string,width:int,height:int,n_frames:int,sample_rate:int>",
    )
    [row] = decode_media(df).collect()
    return row


# --- JPEG fixtures --------------------------------------------------------


def _jpeg(width: int, height: int, sof_marker: int = 0xC0, extras: bytes = b"") -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    frame = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    sof = bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(frame)) + frame
    return b"\xff\xd8" + app0 + extras + sof + b"\xff\xd9"


def test_jpeg_baseline_dims(spark):
    payload = _jpeg(640, 480)
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (640, 480)
    assert row.byte_sum == sum(payload)  # structural tier: raw byte sum


def test_jpeg_progressive_and_fill_bytes(spark):
    # SOF2 (progressive) behind a comment segment and marker fill bytes
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    payload = _jpeg(31, 17, sof_marker=0xC2, extras=com + b"\xff")
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (31, 17)


def test_jpeg_dht_is_not_sof(spark):
    # DHT is 0xC4 — inside the SOF numeric range but NOT a frame header
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    payload = _jpeg(12, 34, extras=dht)
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (12, 34)


def test_jpeg_truncated_falls_back(spark):
    payload = _jpeg(64, 64)[:9]  # cut inside the APP0 segment
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (META["width"], META["height"])
    assert row.byte_sum == sum(payload)


# --- GIF fixtures ---------------------------------------------------------


def _gif_lzw(indices: list[int], min_code: int) -> bytes:
    """Clear-code-before-every-pixel LZW: each pixel is emitted as its
    literal code at the initial width — valid GIF (the table never
    grows), trivially encodable by hand."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    out = bytearray()
    codes = []
    for i in indices:
        codes += [clear, i]
    codes.append(eoi)
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(
    w: int,
    h: int,
    palette: list[tuple[int, int, int]],
    frames: list[list[int]],
    interlaced: bool = False,
    local_palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Hand-built GIF89a: global palette (padded to a power of two),
    one image block per frame; `local_palette` applies to the LAST frame."""
    n = max(2, 1 << (max(len(palette) - 1, 1)).bit_length())
    depth = n.bit_length() - 1
    pal = bytearray()
    for i in range(n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        pal += bytes([r, g, b])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag + size
    out += pal
    min_code = max(2, depth)
    for fi, frame in enumerate(frames):
        use_local = local_palette is not None and fi == len(frames) - 1
        flags = (0x40 if interlaced else 0) | (
            0x80 | (depth - 1) if use_local else 0
        )
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([flags])
        if use_local:
            lp = bytearray()
            for i in range(n):
                r, g, b = (
                    local_palette[i] if i < len(local_palette) else (0, 0, 0)
                )
                lp += bytes([r, g, b])
            out += lp
        data = _gif_lzw(frame, min_code)
        out += bytes([min_code])
        pos = 0
        while pos < len(data):
            chunk = data[pos : pos + 255]
            out += bytes([len(chunk)]) + chunk
            pos += 255
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_full_decode_pixel_sum(spark):
    pal = [(10, 0, 0), (0, 20, 0), (0, 0, 30), (5, 5, 5)]
    frame = [0, 1, 2, 3]  # 2x2
    payload = _gif(2, 2, pal, [frame])
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (2, 2)
    assert row.byte_sum == 10 + 20 + 30 + 15


def test_gif_animation_sums_all_frames(spark):
    pal = [(1, 1, 1), (2, 2, 2)]
    payload = _gif(2, 1, pal, [[0, 1], [1, 1]])
    row = _decode_one(spark, payload)
    assert row.byte_sum == (3 + 6) + (6 + 6)


def test_gif_interlace_flag_does_not_change_sum(spark):
    pal = [(7, 0, 0), (0, 7, 0)]
    flat = _gif(1, 4, pal, [[0, 1, 0, 1]])
    inter = _gif(1, 4, pal, [[0, 1, 0, 1]], interlaced=True)
    assert _decode_one(spark, flat).byte_sum == _decode_one(spark, inter).byte_sum == 28


def test_gif_local_palette_overrides_global(spark):
    gpal = [(100, 0, 0), (0, 100, 0)]
    lpal = [(1, 0, 0), (0, 1, 0)]
    payload = _gif(2, 1, gpal, [[0, 1]], local_palette=lpal)
    row = _decode_one(spark, payload)
    assert row.byte_sum == 2


def test_gif_truncated_falls_back(spark):
    payload = _gif(2, 2, [(1, 1, 1), (2, 2, 2)], [[0, 1, 0, 1]])[:-4]
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (META["width"], META["height"])


# --- BMP fixtures ---------------------------------------------------------


def _bmp_header(w: int, h: int, bpp: int, palette: list[tuple[int, int, int]] | None, body: bytes) -> bytes:
    pal = bytearray()
    if palette is not None:
        for b, g, r in [(b, g, r) for (r, g, b) in palette]:
            pal += bytes([b, g, r, 0])
    data_off = 14 + 40 + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 0, 0,
        len(palette) if palette else 0, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    return hdr + info + bytes(pal) + body


def test_bmp_24bit_with_stride_padding(spark):
    # 3x2, stride = 12 (9 pixel bytes + 3 pad) — pad must NOT be summed
    rows = []
    val = 1
    expect = 0
    for _ in range(2):
        row = bytearray()
        for _ in range(3):
            row += bytes([val, val + 1, val + 2])  # B,G,R
            expect += val + (val + 1) + (val + 2)
            val += 3
        row += b"\xff\xff\xff"  # stride padding (poisoned on purpose)
        rows.append(bytes(row))
    payload = _bmp_header(3, 2, 24, None, b"".join(rows))
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (3, 2)
    assert row.byte_sum == expect


def test_bmp_8bit_palette(spark):
    pal = [(10, 20, 30), (1, 2, 3)]
    body = bytes([0, 1, 1, 0]) + b"\x00" * 0  # 4x1 row, stride 4
    payload = _bmp_header(4, 1, 8, pal, body)
    row = _decode_one(spark, payload)
    assert row.byte_sum == 60 + 6 + 6 + 60


def test_bmp_32bit_excludes_alpha(spark):
    # 1x1 BGRX with alpha 0xFF: only B+G+R counted
    body = bytes([5, 6, 7, 0xFF])
    payload = _bmp_header(1, 1, 32, None, body)
    row = _decode_one(spark, payload)
    assert row.byte_sum == 18


def test_bmp_topdown_negative_height(spark):
    body = bytes([1, 2, 3, 0]) * 2  # 1-wide, 2 rows, stride 4
    payload = _bmp_header(1, -2, 24, None, body)
    row = _decode_one(spark, payload)
    assert (row.width, row.height) == (1, 2)
    assert row.byte_sum == 12


def test_bmp_rle_falls_back(spark):
    body = bytes([1, 2, 3, 0])
    payload = bytearray(_bmp_header(1, 1, 24, None, body))
    payload[30:34] = struct.pack("<I", 1)  # BI_RLE8
    row = _decode_one(spark, bytes(payload))
    assert (row.width, row.height) == (META["width"], META["height"])
