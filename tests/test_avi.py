"""Pure-stdlib uncompressed-RGB AVI codec (r11 video de-stub). DIB
frames are lossless, so round trips assert EXACT pixel equality."""

import struct

import numpy as np
import pytest

from dataflow_flex_pyarrow_to_gds_spark.operators.avi import (
    avi_decode,
    avi_encode,
)


def test_round_trip_exact_various_shapes():
    rng = np.random.default_rng(4)
    for n, h, w, rate, scale in (
        (1, 1, 1, 25, 1),
        (3, 5, 7, 2, 1),          # odd width → 4-byte row padding
        (6, 4, 6, 30, 1),
        (4, 3, 3, 30000, 1001),   # NTSC-style rational rate
    ):
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out, r2, s2 = avi_decode(avi_encode(frames, rate=rate, scale=scale))
        assert (r2, s2) == (rate, scale)
        assert out.shape == frames.shape
        assert (out == frames).all(), (n, h, w)


def test_guards():
    frames = np.zeros((2, 2, 2, 3), dtype=np.uint8)
    good = bytearray(avi_encode(frames, rate=10))

    with pytest.raises(ValueError, match="not a RIFF"):
        avi_decode(b"\x89PNG....")
    with pytest.raises(ValueError, match="not AVI"):
        avi_decode(bytes(good[:8]) + b"WAVE" + bytes(good[12:]))
    with pytest.raises(ValueError, match="expected"):
        avi_encode(np.zeros((2, 2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="empty"):
        avi_encode(np.zeros((0, 2, 2, 3), dtype=np.uint8))

    # compressed codec tag → loud NotImplementedError
    comp = bytearray(good)
    strf_at = comp.find(b"strf")
    # biCompression sits 16 bytes into BITMAPINFOHEADER (after the
    # 8-byte chunk header)
    struct.pack_into("<I", comp, strf_at + 8 + 16, 0x47504A4D)  # 'MJPG'
    with pytest.raises(NotImplementedError, match="compressed codec"):
        avi_decode(bytes(comp))


def test_sample_frames_real_avi_spark(spark):
    """The Spark surface: sample_frames dispatches RIFF-AVI payloads to
    the REAL decoder — sampled indices follow the integer cadence and
    frame bytes equal the source pixels; non-AVI payloads keep the
    deterministic stub."""
    import hashlib

    import pandas as pd

    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        sample_frames,
    )

    rng = np.random.default_rng(6)
    vid = rng.integers(0, 256, (5, 2, 3, 3), dtype=np.uint8)
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "payload": [avi_encode(vid, rate=2), b"not a video"],
        }
    )
    rows = sample_frames(
        spark.createDataFrame(pdf), every_ms=500, max_frames=8
    ).collect()
    real = sorted(
        ((r["frame_idx"], r["frame_ms"], bytes(r["frame"]))
         for r in rows if r["media_id"] == 1)
    )
    # fps 2, every 500 ms → indices 0..4 at t = 0,500,...,2000
    assert [(i, m) for i, m, _ in real] == [
        (0, 0), (1, 500), (2, 1000), (3, 1500), (4, 2000)
    ]
    for i, _m, blob in real:
        assert blob == vid[i].tobytes()
    stub = [r for r in rows if r["media_id"] == 2]
    assert len(stub) == 8
    assert bytes(stub[0]["frame"]) == hashlib.sha256(
        b"not a video" + (0).to_bytes(4, "big")
    ).digest()


def test_video_frame_stats_matches_numpy(spark):
    import pandas as pd

    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        video_frame_stats,
    )

    rng = np.random.default_rng(8)
    vid = rng.integers(0, 256, (4, 3, 2, 3), dtype=np.uint8)
    pdf = pd.DataFrame(
        {"media_id": [7], "payload": [avi_encode(vid, rate=4)]}
    )
    got = {
        r["frame_idx"]: r.asDict()
        for r in video_frame_stats(
            spark.createDataFrame(pdf), every_ms=250, max_frames=8
        ).collect()
    }
    # 4 fps, every 250 ms → idx = k at t = 250k, k = 0..3
    assert sorted(got) == [0, 1, 2, 3]
    for idx, row in got.items():
        s = vid[idx].astype(np.int64).sum(axis=(0, 1))
        assert (row["sum_c0"], row["sum_c1"], row["sum_c2"]) == tuple(
            int(x) for x in s
        )
        assert (row["width"], row["height"]) == (2, 3)
