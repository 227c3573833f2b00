"""Real WAV decode path in decode_media (round 6 — widens the real
tier beyond PNG, VERDICT r5 'What's missing' item 3).

Fixtures are encoded with the stdlib `wave` module (an independent
writer — the decoder never sees its own encoder), plus raw struct-built
edge cases (24-bit PCM, odd-length chunks, float format, truncation).
decode_media must recover channels / frames-per-channel and the exact
absolute sample sum through the Arrow mapInPandas path; undecodable
variants must keep the byte-stats tier.
"""

from __future__ import annotations

import io
import struct
import wave

import pytest

from etl_pipline_ibrd_loan_system_spark.operators import multimodal


def encode_wav(samples: list[int], n_ch: int, sampwidth: int) -> bytes:
    """stdlib-encoded PCM WAV; `samples` interleaved across channels.
    8-bit is unsigned per the WAV spec (wave expects 0..255)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(16000)
        if sampwidth == 1:
            frames = bytes(s & 0xFF for s in samples)
        elif sampwidth == 2:
            frames = b"".join(struct.pack("<h", s) for s in samples)
        elif sampwidth == 3:
            frames = b"".join(
                s.to_bytes(3, "little", signed=True) for s in samples
            )
        else:
            frames = b"".join(struct.pack("<i", s) for s in samples)
        w.writeframes(frames)
    return buf.getvalue()


def _decode(spark, payloads):
    rows = [
        (i, bytearray(p), ("wav", 1, 1, 1, 16000)) for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(
        rows, f"media_id bigint, data binary, meta {multimodal.MEDIA_META}"
    )
    out = multimodal.decode_media(df).collect()
    return {r.media_id: r for r in sorted(out, key=lambda r: r.media_id)}


@pytest.mark.parametrize(
    ("sampwidth", "samples", "expect_sum"),
    [
        # 8-bit unsigned: |v - 128|
        (1, [0, 128, 255, 200], 128 + 0 + 127 + 72),
        (2, [1000, -2000, 32767, -32768], 1000 + 2000 + 32767 + 32768),
        (3, [100_000, -8_000_000, 0, 7_777_777], 100_000 + 8_000_000 + 7_777_777),
        (4, [2_000_000_000, -2_000_000_000, 12, -7], 4_000_000_019),
    ],
)
def test_wav_abs_sample_sum(spark, sampwidth, samples, expect_sum):
    got = _decode(spark, [encode_wav(samples, n_ch=2, sampwidth=sampwidth)])[0]
    assert (got.width, got.height) == (2, len(samples) // 2)
    assert got.byte_sum == expect_sum


def test_wav_mono_frame_count(spark):
    payload = encode_wav([5, -5, 10], n_ch=1, sampwidth=2)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height, got.byte_sum) == (1, 3, 20)
    assert got.n_bytes == len(payload)


def _float_wav(values, bits: int, n_ch: int = 1, audio_fmt: int = 3) -> bytes:
    code = {32: "<f", 64: "<d"}[bits]
    data = b"".join(struct.pack(code, v) for v in values)
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, n_ch, 16000, 16000 * n_ch * bits // 8,
        n_ch * bits // 8, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_float32_wav_real_decode(spark):
    """audio_format=3 (IEEE float32) gets a REAL decode (r7): each
    sample contributes trunc(abs(v)*32768), integral on the 16-bit
    scale."""
    payload = _float_wav([0.5, -0.25, 1.0, -1.0], bits=32)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (1, 4)
    assert got.byte_sum == 16384 + 8192 + 32768 + 32768


def test_float64_wav_real_decode_stereo(spark):
    payload = _float_wav([0.125, -0.5, 0.75, -0.0625], bits=64, n_ch=2)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (2, 2)
    assert got.byte_sum == 4096 + 16384 + 24576 + 2048


def test_nonfinite_float_wav_falls_back(spark):
    """NaN/inf samples mark the payload malformed — byte-stats tier,
    meta dims pass through."""
    payload = _float_wav([0.5, float("nan")], bits=32)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (1, 1)  # meta pass-through
    assert got.byte_sum == sum(payload)


# -- IMA/DVI ADPCM: independent in-test encoder ---------------------------

IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_encode_block(samples, pred, idx):
    """Encode one channel's samples (after the header frame) to nibbles,
    tracking the DECODER's reconstruction; returns (nibbles, decoded)."""
    nibbles, decoded = [], []
    for s in samples:
        st = IMA_STEPS[idx]
        delta = s - pred
        nib = 0
        if delta < 0:
            nib, delta = 8, -delta
        if delta >= st:
            nib |= 4
            delta -= st
        if delta >= st >> 1:
            nib |= 2
            delta -= st >> 1
        if delta >= st >> 2:
            nib |= 1
        # decoder reconstruction
        diff = st >> 3
        if nib & 1:
            diff += st >> 2
        if nib & 2:
            diff += st >> 1
        if nib & 4:
            diff += st
        pred = max(-32768, pred - diff) if nib & 8 else min(32767, pred + diff)
        idx = max(0, min(88, idx + IMA_INDEX[nib & 7]))
        nibbles.append(nib)
        decoded.append(pred)
    return nibbles, decoded


def _adpcm_wav(chan_samples, block_align):
    """WAV IMA-ADPCM payload from per-channel sample lists (all same
    length; first sample of each block is the header predictor). Returns
    (payload, expected_abs_sum, frames_per_channel)."""
    n_ch = len(chan_samples)
    body_len = block_align - 4 * n_ch
    per_block = 1 + body_len * 2 // n_ch  # frames a full block carries
    blocks, abs_sum, frames = [], 0, 0
    pos = 0
    n = len(chan_samples[0])
    while pos < n:
        take = min(per_block, n - pos)
        header, chan_nibs = b"", []
        for ch in range(n_ch):
            seg = chan_samples[ch][pos : pos + take]
            pred, idx = seg[0], 30
            abs_sum += abs(pred)
            nibs, decoded = _ima_encode_block(seg[1:], pred, idx)
            nibs += [0] * (body_len * 2 // n_ch - len(nibs))  # pad block
            header += struct.pack("<hBB", pred, idx, 0)
            chan_nibs.append(nibs)
            abs_sum += sum(abs(v) for v in decoded)
        # decode the PAD nibbles exactly as the decoder will: continue
        # the state after the real samples
        for ch in range(n_ch):
            seg = chan_samples[ch][pos : pos + take]
            pred, idx = seg[0], 30
            _, decoded = _ima_encode_block(seg[1:], pred, idx)
            state_p = decoded[-1] if decoded else pred
            # recompute idx after real samples
            state_i = 30
            for nib in _ima_encode_block(seg[1:], pred, 30)[0]:
                st = IMA_STEPS[state_i]
                state_i = max(0, min(88, state_i + IMA_INDEX[nib & 7]))
            n_pad = body_len * 2 // n_ch - (take - 1)
            p, i2 = state_p, state_i
            for _ in range(n_pad):
                st = IMA_STEPS[i2]
                diff = st >> 3  # nibble 0
                p = min(32767, p + diff)
                i2 = max(0, min(88, i2 + IMA_INDEX[0]))
                abs_sum += abs(p)
        frames += 1 + body_len * 2 // n_ch
        body = bytearray()
        if n_ch == 1:
            nibs = chan_nibs[0]
            for k in range(0, len(nibs), 2):
                body.append(nibs[k] | (nibs[k + 1] << 4))
        else:
            # interleave 8-sample (4-byte) groups per channel
            for g in range(0, len(chan_nibs[0]), 8):
                for ch in range(n_ch):
                    grp = chan_nibs[ch][g : g + 8]
                    for k in range(0, 8, 2):
                        body.append(grp[k] | (grp[k + 1] << 4))
        blocks.append(header + bytes(body))
        pos += take
    data = b"".join(blocks)
    fmt = struct.pack("<HHIIHH", 0x11, n_ch, 8000, 4055, block_align, 4)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return payload, abs_sum, frames


def test_ima_adpcm_mono_decode(spark):
    """4-bit IMA-ADPCM mono: the decoder must reproduce the encoder's
    tracked reconstruction exactly (predictor header = frame 0, nibble
    low-first, step/index table walk)."""
    import math

    samples = [int(8000 * math.sin(i / 5)) for i in range(33)]
    payload, abs_sum, frames = _adpcm_wav([samples], block_align=20)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (1, frames)
    assert got.byte_sum == abs_sum


def test_ima_adpcm_stereo_interleave(spark):
    """Stereo: 4-byte-per-channel group interleave, independent
    per-channel predictor state."""
    import math

    left = [int(6000 * math.sin(i / 3)) for i in range(17)]
    right = [int(3000 * math.cos(i / 7)) for i in range(17)]
    payload, abs_sum, frames = _adpcm_wav([left, right], block_align=24)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (2, frames)
    assert got.byte_sum == abs_sum


def test_ima_adpcm_bad_step_index_falls_back(spark):
    """A block header step index > 88 is malformed — byte-stats tier."""
    header = struct.pack("<hBB", 100, 99, 0)  # index 99 > 88
    data = header + bytes(16)
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, len(data), 4)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    got = _decode(spark, [payload])[0]
    assert got.byte_sum == sum(payload)


def test_truncated_data_chunk_falls_back(spark):
    """A data chunk that isn't a whole number of frames must not decode."""
    payload = bytearray(encode_wav([1, 2, 3, 4], n_ch=2, sampwidth=2))
    # chop one byte off the data chunk AND fix no headers — malformed
    payload = bytes(payload[:-1])
    got = _decode(spark, [payload])[0]
    assert got.byte_sum == sum(payload)


def test_non_riff_payload_keeps_byte_stats(spark):
    payload = b"definitely not audio"
    got = _decode(spark, [payload])[0]
    assert got.byte_sum == sum(payload)


def _adpcm_wav_with_fact(samples, block_align, spb=None, fact_total=None):
    """Mono IMA payload whose fmt carries the wSamplesPerBlock extension
    and whose fact chunk declares the true per-channel frame count —
    the real-world layout (ADVICE r7): expected sums EXCLUDE pad
    nibbles in the final block."""
    body_len = block_align - 4
    capacity = 1 + body_len * 2
    spb = capacity if spb is None else spb
    fact_total = len(samples) if fact_total is None else fact_total
    blocks, abs_sum = [], 0
    pos = 0
    while pos < len(samples):
        take = min(spb, len(samples) - pos)
        seg = samples[pos : pos + take]
        pred, idx = seg[0], 30
        abs_sum += abs(pred)
        nibs, decoded = _ima_encode_block(seg[1:], pred, idx)
        abs_sum += sum(abs(v) for v in decoded)
        nibs += [0] * (body_len * 2 - len(nibs))  # pads: NOT counted
        body = bytearray()
        for k in range(0, len(nibs), 2):
            body.append(nibs[k] | (nibs[k + 1] << 4))
        blocks.append(struct.pack("<hBB", pred, 30, 0) + bytes(body))
        pos += take
    data = b"".join(blocks)
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, block_align, 4)
    fmt += struct.pack("<HH", 2, spb)  # cbSize=2, wSamplesPerBlock
    fact = struct.pack("<I", fact_total)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return payload, abs_sum


def test_ima_adpcm_partial_final_block_not_padded(spark):
    """ADVICE r7: a final block holding fewer samples than
    wSamplesPerBlock must contribute only its REAL frames — pad nibbles
    are neither counted in height nor folded into byte_sum."""
    import math

    samples = [int(7000 * math.sin(i / 4)) for i in range(10)]
    # block_align=20 -> capacity 33 frames; 10 real -> 23 pad frames
    payload, abs_sum = _adpcm_wav_with_fact(samples, block_align=20)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (1, 10)
    assert got.byte_sum == abs_sum


def test_ima_adpcm_fact_caps_multiblock_tail(spark):
    """Two blocks, fact says 40 of 66 capacity frames: the second
    block's decode stops at frame 40."""
    import math

    samples = [int(5000 * math.cos(i / 6)) for i in range(40)]
    payload, abs_sum = _adpcm_wav_with_fact(samples, block_align=20, spb=33)
    got = _decode(spark, [payload])[0]
    assert (got.width, got.height) == (1, 40)
    assert got.byte_sum == abs_sum


def test_ima_adpcm_inconsistent_spb_falls_back(spark):
    """wSamplesPerBlock exceeding block capacity is malformed — the
    payload drops to the byte-stats tier instead of mis-decoding."""
    import math

    samples = [int(4000 * math.sin(i / 3)) for i in range(10)]
    payload, _ = _adpcm_wav_with_fact(samples, block_align=20, spb=99)
    got = _decode(spark, [payload])[0]
    assert got.byte_sum == sum(payload)  # raw byte-stats, not a decode
