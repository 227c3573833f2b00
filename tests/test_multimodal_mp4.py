"""MP4 (ISO BMFF) structural decode tier: hand-built box trees prove
the parser reads real track dimensions; malformed/non-visual payloads
fall back to the byte-stats tier with metadata dims."""

from __future__ import annotations

import struct

from etl_pipline_ibrd_loan_system_spark.operators import multimodal


def _box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _tkhd(w: int, h: int) -> bytes:
    # version/flags + the fixed fields up to width/height (84 bytes for
    # version 0), with 16.16 fixed-point dimensions in the last 8
    body = bytes(1) + bytes(3) + bytes(72) + struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _mp4(w: int, h: int, large_moov: bool = False) -> bytes:
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    audio_trak = _box(b"trak", _tkhd(0, 0))  # audio track: zero dims
    video_trak = _box(b"trak", _tkhd(w, h))
    moov = _box(b"moov", audio_trak + video_trak, large=large_moov)
    mdat = _box(b"mdat", b"\x01\x02\x03\x04")
    return ftyp + moov + mdat


def _decode(spark, payloads):
    rows = [
        (i, bytearray(p), ("mp4", 7, 9, 1, 0)) for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(
        rows, f"media_id bigint, data binary, meta {multimodal.MEDIA_META}"
    )
    return {
        r.media_id: r for r in multimodal.decode_media(df).collect()
    }


def test_mp4_track_dimensions_parsed(spark):
    p = _mp4(640, 360)
    got = _decode(spark, [p])[0]
    assert (got.width, got.height) == (640, 360)
    assert got.byte_sum == sum(p)  # samples undecoded: raw byte sum
    assert got.n_bytes == len(p)


def test_mp4_64bit_box_and_audio_only(spark):
    big = _mp4(1920, 1080, large_moov=True)
    audio_only = _box(b"ftyp", b"isom") + _box(b"moov", _box(b"trak", _tkhd(0, 0)))
    got = _decode(spark, [big, audio_only])
    assert (got[0].width, got[0].height) == (1920, 1080)
    # no visual track -> fallback tier keeps the metadata dims (7, 9)
    assert (got[1].width, got[1].height) == (7, 9)


def test_truncated_mp4_falls_back(spark):
    p = _mp4(640, 360)[:-6]  # mdat size now exceeds the payload
    got = _decode(spark, [p])[0]
    assert (got.width, got.height) == (7, 9)
    assert got.byte_sum == sum(p)
