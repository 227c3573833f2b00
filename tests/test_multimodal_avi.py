"""MJPEG-in-AVI video tiers (r7): decode_media's AVI sniff (dims from
the first frame's own JPEG SOF) and extract_video_frames (REAL per-frame
sampling out of the movi chunk list — one row per sampled frame with
frame-level dims and byte sums). Fixtures are hand-built RIFF/AVI
containers around the same minimal JPEG encoder the JPEG tier tests use
(an independent writer; the decoder never sees its own encoder)."""

from __future__ import annotations

import struct

from etl_pipline_ibrd_loan_system_spark.operators import multimodal


def _jpeg(width: int, height: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    frame = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(frame)) + frame
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _avi(frames: list[bytes]) -> bytes:
    avih = _chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0, len(frames),
                                       0, 1, 0, 64, 48, 0, 0, 0, 0))
    hdrl = _chunk(b"LIST", b"hdrl" + avih)
    movi_body = b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _chunk(b"LIST", movi_body)
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _decode(spark, payloads):
    rows = [
        (i, bytearray(p), ("mp4", 7, 9, 3, 16000)) for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(
        rows, f"media_id bigint, data binary, meta {multimodal.MEDIA_META}"
    )
    return df


def test_avi_dims_from_first_frame_sof(spark):
    """decode_media must report the FIRST video frame's SOF dims, not
    the container header's (64x48 in avih vs 31x17 in the frame)."""
    payload = _avi([_jpeg(31, 17), _jpeg(31, 17)])
    got = multimodal.decode_media(_decode(spark, [payload])).collect()[0]
    assert (got.width, got.height) == (31, 17)
    assert got.byte_sum == sum(payload)


def test_avi_non_jpeg_codec_falls_back(spark):
    payload = _avi([b"\x00\x01\x02\x03"])  # not a JPEG frame
    got = multimodal.decode_media(_decode(spark, [payload])).collect()[0]
    assert (got.width, got.height) == (7, 9)  # meta pass-through
    assert got.byte_sum == sum(payload)


def test_extract_video_frames_every_frame(spark):
    frames = [_jpeg(31, 17), _jpeg(32, 18), _jpeg(33, 19)]
    payload = _avi(frames)
    rows = sorted(
        multimodal.extract_video_frames(_decode(spark, [payload])).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.width, r.height) for r in rows] == [
        (0, 31, 17), (1, 32, 18), (2, 33, 19)
    ]
    assert all(r.frame_bytes == len(f) and r.frame_byte_sum == sum(f)
               for r, f in zip(rows, frames))


def test_extract_video_frames_sampled(spark):
    frames = [_jpeg(10 + i, 10) for i in range(7)]
    payload = _avi(frames)
    rows = multimodal.extract_video_frames(
        _decode(spark, [payload]), every=3
    ).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 3, 6]


def test_extract_video_frames_skips_non_avi(spark):
    rows = multimodal.extract_video_frames(
        _decode(spark, [b"not a container", _avi([_jpeg(8, 8)])])
    ).collect()
    assert len(rows) == 1 and rows[0].media_id == 1


def test_extract_video_frames_rejects_nonpositive_every(spark):
    """ADVICE r7: every=0 must raise a clear ValueError on the DRIVER,
    not a ZeroDivisionError task failure inside the executor kernel."""
    import pytest

    from etl_pipline_ibrd_loan_system_spark.operators import multimodal

    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id bigint, data binary")
    for bad in (0, -3, 2.5):
        with pytest.raises(ValueError, match="every must be an int >= 1"):
            multimodal.extract_video_frames(df, every=bad)
