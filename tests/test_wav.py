"""Pure-stdlib WAV/PCM codec (r11 audio de-stub). PCM is lossless, so
round trips assert EXACT sample equality — no bounds needed."""

import struct

import numpy as np
import pytest

from dataflow_flex_pyarrow_to_gds_spark.operators.wav import (
    wav_decode,
    wav_encode,
)


def test_16bit_round_trip_exact_mono_and_stereo():
    rng = np.random.default_rng(3)
    for ch in (1, 2, 4):
        s = rng.integers(-(1 << 15), 1 << 15, (137, ch), dtype=np.int64)
        out, rate = wav_decode(
            wav_encode(s.astype(np.int16), sample_rate=44_100)
        )
        assert rate == 44_100
        assert out.shape == (137, ch)
        assert (out == s).all()
    # 1-D input → (n, 1)
    s1 = rng.integers(-1000, 1000, 55, dtype=np.int64).astype(np.int16)
    out, _ = wav_decode(wav_encode(s1, sample_rate=8000))
    assert out.shape == (55, 1) and (out[:, 0] == s1).all()


def test_8bit_widening_rule():
    s = np.arange(256, dtype=np.int64).reshape(-1, 1)
    out, rate = wav_decode(
        wav_encode(s.astype(np.uint8)[:, 0][:, None].astype(np.int16),
                   sample_rate=8000, bits=8)
    )
    assert rate == 8000
    assert (out[:, 0] == (np.arange(256) - 128) * 256).all()


def test_odd_data_length_padding():
    # 8-bit mono with odd sample count → data chunk needs a pad byte
    s = np.array([[1], [2], [3]], dtype=np.int16)
    payload = wav_encode(s, sample_rate=8000, bits=8)
    assert len(payload) % 2 == 0
    out, _ = wav_decode(payload)
    assert (out[:, 0] == (np.array([1, 2, 3]) - 128) * 256).all()


def test_extra_chunks_skipped():
    """LIST metadata before data — the RIFF contract says skip unknown
    chunks; naive offset-based readers break here."""
    s = np.array([[100, -100], [2000, -2000]], dtype=np.int16)
    payload = bytearray(wav_encode(s, sample_rate=16_000))
    # splice a LIST chunk between fmt and data
    data_at = payload.find(b"data")
    meta = b"LIST" + struct.pack("<I", 6) + b"INFOxy"
    spliced = bytes(payload[:data_at]) + meta + bytes(payload[data_at:])
    # fix RIFF size
    spliced = (
        b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    )
    out, rate = wav_decode(spliced)
    assert rate == 16_000 and (out == s).all()


def test_guards():
    s = np.zeros((4, 1), dtype=np.int16)
    good = bytearray(wav_encode(s, sample_rate=8000))

    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="not WAVE"):
        wav_decode(bytes(good[:8]) + b"AVI " + bytes(good[12:]))
    with pytest.raises(ValueError, match="missing fmt"):
        wav_decode(bytes(good[:12]))

    float_fmt = bytearray(good)
    fmt_at = float_fmt.find(b"fmt ")
    float_fmt[fmt_at + 8] = 3  # format tag → IEEE float
    with pytest.raises(NotImplementedError, match="non-PCM"):
        wav_decode(bytes(float_fmt))

    with pytest.raises(ValueError, match="bits"):
        wav_encode(s, sample_rate=8000, bits=24)
    with pytest.raises(ValueError, match="out of range"):
        wav_encode(np.array([[40000]], dtype=np.int64), sample_rate=8000)


def test_audio_stats_spark_round_trip(spark):
    """The Spark surface: encode WAVs in one mapInPandas, decode + stat
    in the next — exact int64 stats equal the numpy ground truth."""
    import pandas as pd

    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        audio_stats,
    )

    rng = np.random.default_rng(9)
    waves = {
        i: rng.integers(-5000, 5000, (50 + i * 7, 1 + i % 3), dtype=np.int64)
        for i in range(6)
    }
    pdf = pd.DataFrame(
        {
            "media_id": list(waves),
            "payload": [
                wav_encode(v.astype(np.int16), sample_rate=8000 + 100 * k)
                for k, v in waves.items()
            ],
        }
    )
    got = {
        r["media_id"]: r.asDict()
        for r in audio_stats(spark.createDataFrame(pdf)).collect()
    }
    for k, v in waves.items():
        n, ch = v.shape
        rate = 8000 + 100 * k
        row = got[k]
        assert row["sample_rate"] == rate
        assert row["channels"] == ch
        assert row["n_samples"] == n
        assert row["duration_ms"] == n * 1000 // rate
        assert row["sum_abs"] == int(np.abs(v).sum())
        assert row["peak"] == int(np.abs(v).max())
