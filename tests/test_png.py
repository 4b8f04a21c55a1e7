"""Pure-stdlib PNG codec (operators/png.py) — the r10 multimodal
de-stub. Decoder correctness is checked three ways: encode→decode round
trips across every color type and every filter type (the forward
filters are written independently of the unfilters), hand-built byte
streams that bypass the encoder entirely, and the honest
NotImplementedError boundaries."""

import struct
import zlib

import numpy as np
import pytest

from dataflow_flex_pyarrow_to_gds_spark.operators.png import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
)


def _img(h, w, c, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_round_trip_all_color_types(channels):
    img = _img(5, 9, channels)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_round_trip_every_filter_type(ft):
    """Each unfilter branch against its independently-written forward
    filter, on data adversarial to off-by-ones (a ramp wraps the byte
    range; first row exercises the prev=0 boundary)."""
    img = (np.arange(6 * 11 * 3, dtype=np.int64) * 37 % 256).astype(
        np.uint8
    ).reshape(6, 11, 3)
    assert np.array_equal(png_decode(png_encode(img, filter_type=ft)), img)


def test_round_trip_mixed_filters_per_row():
    img = _img(10, 7, 3, seed=11)
    fts = [r % 5 for r in range(10)]
    assert np.array_equal(
        png_decode(png_encode(img, filter_type=fts)), img
    )


def test_decode_handbuilt_stream_bypasses_encoder():
    """A 2×2 RGB image assembled byte-by-byte from the PNG spec (no
    encoder involved): row 0 filter None, row 1 filter Sub — so a bug
    symmetric in the encode/decode pair cannot hide here."""

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    # row0 raw: (10,20,30) (40,50,60) — filter 0
    row0 = bytes([0, 10, 20, 30, 40, 50, 60])
    # row1 pixels: (5,5,5) (9,8,7) — filter 1 (Sub): first pixel as-is,
    # second stores delta to left neighbor: (4, 3, 2)
    row1 = bytes([1, 5, 5, 5, 4, 3, 2])
    payload = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    out = png_decode(payload)
    expect = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[5, 5, 5], [9, 8, 7]]],
        dtype=np.uint8,
    )
    assert np.array_equal(out, expect)


def test_decode_palette_expands_to_rgb():
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    scan = bytes([0, 2, 0, 1])  # indices: blue red green
    payload = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = png_decode(payload)
    expect = np.array(
        [[[0, 0, 255], [255, 0, 0], [0, 255, 0]]], dtype=np.uint8
    )
    assert np.array_equal(out, expect)


def test_multi_idat_chunks_concatenate():
    """IDAT may be split arbitrarily; the zlib stream spans chunks."""

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    img = _img(3, 4, 3, seed=3)
    full = png_encode(img)
    # re-split its single IDAT into 1-byte IDATs
    (ihdr_len,) = struct.unpack(">I", full[8:12])
    idat_start = 8 + 12 + ihdr_len
    (idat_len,) = struct.unpack(">I", full[idat_start : idat_start + 4])
    zdata = full[idat_start + 8 : idat_start + 8 + idat_len]
    rebuilt = (
        full[:idat_start]
        + b"".join(chunk(b"IDAT", bytes([b])) for b in zdata)
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(rebuilt), img)


def test_unsupported_variants_raise_loudly():
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    scan = zlib.compress(bytes([0, 1, 2]))
    for depth, interlace, err in [
        (16, 0, "bit depth"),
        (8, 1, "interlace"),
    ]:
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, 0, 0, 0, interlace)
        payload = (
            PNG_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", scan)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match=err):
            png_decode(payload)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png")


def test_smart_decode_dispatch():
    """PNG/JPEG magic → real decoders (malformed real-format bytes
    fail LOUDLY, they don't fall back to the fake); anything
    unrecognized → the deterministic fake (8×8×3), preserving the stub
    contract for absent codecs."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        fake_decode,
        smart_decode,
    )

    img = _img(4, 6, 3, seed=5)
    assert np.array_equal(smart_decode(png_encode(img)), img)
    with _pytest.raises(ValueError):  # r11: JPEG magic is real now
        smart_decode(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    other = b"RIFF....WEBP no codec here"
    assert np.array_equal(smart_decode(other), fake_decode(other))
    assert smart_decode(b"").shape == (8, 8, 3)


def test_image_channel_sums_spark_round_trip(spark):
    """The Spark surface: encode PNGs in one mapInPandas, decode + sum
    in the next — exact int64 sums equal the numpy ground truth."""
    import pandas as pd

    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        image_channel_sums,
    )

    imgs = {i: _img(3 + i % 3, 4 + i % 2, 3, seed=i) for i in range(6)}
    pdf = pd.DataFrame(
        {"media_id": list(imgs), "payload": [png_encode(v) for v in imgs.values()]}
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["media_id"]: (
            r["width"], r["height"], r["channels"],
            r["sum_c0"], r["sum_c1"], r["sum_c2"],
        )
        for r in image_channel_sums(df).collect()
    }
    for i, img in imgs.items():
        s = img.astype(np.int64).sum(axis=(0, 1))
        assert got[i] == (
            img.shape[1], img.shape[0], 3, int(s[0]), int(s[1]), int(s[2])
        )


def test_bmp_round_trip_and_padding():
    """24-bpp BMP: encode→decode identity at widths that exercise the
    4-byte row-padding rule (w=1,2,3,5), bottom-up storage."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.bmp import (
        bmp_decode,
        bmp_encode,
    )

    for w in (1, 2, 3, 5):
        img = _img(4, w, 3, seed=w)
        assert np.array_equal(bmp_decode(bmp_encode(img)), img), w


def test_bmp_handbuilt_palette_and_topdown():
    """Hand-built byte streams bypassing the encoder: an 8-bit palette
    image and a TOP-DOWN (negative height) 24-bpp image."""
    import struct as _s

    from dataflow_flex_pyarrow_to_gds_spark.operators.bmp import bmp_decode

    # --- palette: 2x2, indices [[0,1],[2,0]], colors R,G,B ---
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0])  # BGRx
    rows = bytes([2, 0, 0, 0]) + bytes([0, 1, 0, 0])  # bottom-up, padded
    dib = _s.pack("<IiihHIIiiII", 40, 2, 2, 1, 8, 0, len(rows), 0, 0, 3, 0)
    hdr = _s.pack("<2sIHHI", b"BM", 14 + 40 + 12 + len(rows), 0, 0,
                  14 + 40 + 12)
    img = bmp_decode(hdr + dib + pal + rows)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(img, expect)

    # --- top-down 24bpp: height = -2, first stored row IS row 0 ---
    px = bytes([255, 0, 0,  0, 255, 0]) + b"\x00\x00"  # row0: B,G pixels
    px += bytes([0, 0, 255,  255, 255, 255]) + b"\x00\x00"  # row1: R, white
    dib = _s.pack("<IiihHIIiiII", 40, 2, -2, 1, 24, 0, len(px), 0, 0, 0, 0)
    hdr = _s.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 54)
    img = bmp_decode(hdr + dib + px)
    expect = np.array(
        [[[0, 0, 255], [0, 255, 0]], [[255, 0, 0], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert np.array_equal(img, expect)


def test_bmp_unsupported_raise():
    import struct as _s

    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.bmp import bmp_decode

    dib = _s.pack("<IiihHIIiiII", 40, 1, 1, 1, 24, 1, 4, 0, 0, 0, 0)  # RLE
    hdr = _s.pack("<2sIHHI", b"BM", 58, 0, 0, 54)
    with _pytest.raises(NotImplementedError, match="compression"):
        bmp_decode(hdr + dib + b"\x00\x00\x00\x00")
    with _pytest.raises(ValueError, match="signature"):
        bmp_decode(b"PNGnope")


def test_smart_decode_bmp_dispatch():
    from dataflow_flex_pyarrow_to_gds_spark.operators.bmp import bmp_encode
    from dataflow_flex_pyarrow_to_gds_spark.operators.multimodal import (
        smart_decode,
    )

    img = _img(3, 4, 3, seed=2)
    assert np.array_equal(smart_decode(bmp_encode(img)), img)


def test_codec_round_trips_hypothesis():
    """Property: encode→decode is the identity for arbitrary shapes,
    channel counts, and per-row PNG filter choices."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.bmp import (
        bmp_decode,
        bmp_encode,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31),
        data=st.data(),
    )
    def png_prop(h, w, c, seed, data):
        img = _img(h, w, c, seed=seed)
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        assert np.array_equal(
            png_decode(png_encode(img, filter_type=fts)), img
        )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        seed=st.integers(0, 2**31),
    )
    def bmp_prop(h, w, seed):
        img = _img(h, w, 3, seed=seed)
        assert np.array_equal(bmp_decode(bmp_encode(img)), img)

    png_prop()
    bmp_prop()
