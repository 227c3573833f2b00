"""Audio constellation fingerprints (operators/multimodal.py::
audio_fingerprint) against wave-module-encoded ground truth: known
sine tones must peak in the predicted FFT bin, identical audio must
share all landmarks, a time-shifted copy most of them, and a different
tone almost none. FFT is not SQL-expressible, so this fixture tier IS
the evidence (same policy as the committing file sink)."""

from __future__ import annotations

import io
import math
import wave

import pytest

from etl_pipline_ibrd_loan_system_spark.operators.multimodal import (
    audio_fingerprint,
)

RATE = 8000
FRAME = 256
HOP = 128


def _tone_wav(freq: float, seconds: float, rate: int = RATE, shift: int = 0):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        n = int(rate * seconds)
        samples = bytearray()
        for i in range(n):
            v = int(20000 * math.sin(2 * math.pi * freq * (i + shift) / rate))
            samples += v.to_bytes(2, "little", signed=True)
        w.writeframes(bytes(samples))
    return buf.getvalue()


def _fp(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id bigint, data binary",
    )
    rows = audio_fingerprint(df, frame=FRAME, hop=HOP).collect()
    return {r.media_id: r for r in rows}


def test_tone_peaks_in_predicted_bin(spark):
    freq = 1000.0
    got = _fp(spark, [_tone_wav(freq, 0.5)])[0]
    assert got.n_frames == (int(RATE * 0.5) - FRAME) // HOP + 1
    assert got.sample_rate == RATE
    expected_bin = round(freq * FRAME / RATE)
    # every landmark encodes (peak_a<<24 | peak_b<<8 | dt): all peaks of
    # a pure tone sit in the predicted bin
    for key in got.fingerprints:
        assert key >> 24 == expected_bin
        assert (key >> 8) & 0xFFFF == expected_bin


def test_identical_audio_identical_landmarks(spark):
    a = _tone_wav(700.0, 0.4)
    got = _fp(spark, [a, a])
    assert got[0].fingerprints == got[1].fingerprints
    assert len(got[0].fingerprints) > 0


def test_shifted_copy_overlaps_different_tone_does_not(spark):
    base = set(_fp(spark, [_tone_wav(900.0, 0.5)])[0].fingerprints)
    shifted = set(
        _fp(spark, [_tone_wav(900.0, 0.5, shift=HOP)])[0].fingerprints
    )
    other = set(_fp(spark, [_tone_wav(2500.0, 0.5)])[0].fingerprints)
    assert len(base & shifted) / len(base) > 0.5, "shifted copy lost match"
    assert len(base & other) / len(base) < 0.1, "different tone matched"


def test_non_wav_and_float_payloads_fingerprint_empty(spark):
    got = _fp(spark, [b"\x89PNG\r\n\x1a\nnot audio", b"RIFFxxxxWAVE"])
    for r in got.values():
        assert r.n_frames == 0 and r.fingerprints == []
