"""Pure-stdlib baseline JPEG codec (r11 de-stub, VERDICT r10 #5).

JPEG is lossy, so the test strategy splits:
- EXACT closed-form checks where the math guarantees losslessness
  (flat images at quality 75: all-zero AC, DC quantizer 8 divides
  8·(g−128) exactly) — these back the catalog oracle;
- BOUNDED round-trip checks for content that exercises the AC Huffman
  path, ZRL runs, chroma subsampling, and restart-marker resync;
- spec-pinned constants (zigzag spot values, Huffman table sizes) to
  catch self-consistent transcription errors that round trips cancel;
- loud-failure guards for the honestly-unsupported variants.
"""

import numpy as np
import pytest

from dataflow_flex_pyarrow_to_gds_spark.operators.jpeg import (
    AC_CHROMA_SPEC,
    AC_LUMA_SPEC,
    ZIGZAG,
    jpeg_decode,
    jpeg_encode,
)


def test_flat_gray_exact_round_trip():
    for g in range(0, 256, 17):
        for h, w in ((1, 1), (3, 5), (8, 8), (9, 16), (11, 17)):
            img = np.full((h, w, 1), g, dtype=np.uint8)
            out = jpeg_decode(jpeg_encode(img, quality=75))
            assert out.shape == (h, w, 1)
            assert (out == g).all(), (g, h, w)


def test_flat_rgb_gray_exact_444_and_420():
    for g in (0, 64, 129, 255):
        img = np.full((9, 13, 3), g, dtype=np.uint8)
        for ss in (False, True):
            out = jpeg_decode(jpeg_encode(img, quality=75, subsample=ss))
            assert out.shape == (9, 13, 3)
            assert (out == g).all(), (g, ss)


def test_two_tone_blocks_exact():
    """Per-8×8-block flat content with DIFFERENT values per block: the
    DC-prediction chain across blocks must carry differences exactly
    (still AC-free, so still lossless at quality 75)."""
    img = np.zeros((16, 24, 1), dtype=np.uint8)
    vals = [10, 250, 128, 3, 77, 200]
    k = 0
    for by in range(2):
        for bx in range(3):
            img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, 0] = vals[k]
            k += 1
    out = jpeg_decode(jpeg_encode(img, quality=75))
    assert (out == img).all()


def test_gradient_round_trip_bounded():
    img = (
        (np.arange(24)[:, None, None] * 9
         + np.arange(31)[None, :, None] * 5
         + np.arange(3)[None, None, :] * 40) % 256
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert err.max() <= 32 and err.mean() <= 6.0, (err.max(), err.mean())


def test_noise_with_restart_markers():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (33, 29), dtype=np.uint8)
    plain = jpeg_decode(jpeg_encode(noise, quality=90))
    rst = jpeg_decode(jpeg_encode(noise, quality=90, restart_interval=3))
    # restart markers change the byte stream but NOT the decoded pixels
    assert (plain == rst).all()
    err = np.abs(rst[:, :, 0].astype(int) - noise.astype(int))
    assert err.max() <= 48, err.max()


def test_subsampled_color_round_trip_bounded():
    # chroma-smooth content (flat hue, luminance gradient): 4:2:0
    # subsampling should cost little
    y = np.tile(np.arange(32, dtype=np.float64)[:, None] * 6 + 40, (1, 24))
    img = np.stack([y, y * 0.8, y * 0.6], axis=2).clip(0, 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90, subsample=True))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 24, err.max()


def test_determinism():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    a = jpeg_encode(img, quality=80, subsample=True)
    b = jpeg_encode(img, quality=80, subsample=True)
    assert a == b
    assert (jpeg_decode(a) == jpeg_decode(b)).all()


def test_spec_pinned_constants():
    """Transcription tripwires: values published in T.81 that a
    self-consistent encoder/decoder pair could get wrong without any
    round-trip test noticing."""
    # zigzag spot values (T.81 Figure A.6)
    assert list(ZIGZAG[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[63] == 63
    assert sorted(ZIGZAG) == list(range(64))  # a permutation
    # Annex K Huffman tables carry exactly 162 AC symbols
    assert sum(AC_LUMA_SPEC[0]) == len(AC_LUMA_SPEC[1]) == 162
    assert sum(AC_CHROMA_SPEC[0]) == len(AC_CHROMA_SPEC[1]) == 162


def test_unsupported_variants_fail_loudly():
    img = np.full((8, 8, 1), 100, dtype=np.uint8)
    payload = bytearray(jpeg_encode(img))
    sof = payload.find(b"\xff\xc0")
    assert sof > 0
    payload[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(bytes(payload))

    with pytest.raises(ValueError, match="signature"):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        jpeg_decode(bytes(jpeg_encode(img))[:20])  # truncated

    with pytest.raises(ValueError, match="quality"):
        jpeg_encode(img, quality=0)
    with pytest.raises(ValueError, match="expected HW"):
        jpeg_encode(np.zeros((4, 4, 2), dtype=np.uint8))


def test_smart_decode_dispatches_jpeg():
    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        smart_decode,
    )

    img = np.full((5, 7, 1), 42, dtype=np.uint8)
    out = smart_decode(jpeg_encode(img, quality=75))
    assert out.shape == (5, 7, 1) and (out == 42).all()
