"""Pure-stdlib BMP decoder — the second real image format behind the
multimodal ``smart_decode`` dispatch (extension mandate; the reference
pipeline has no media surface) (PNG was the first; BMP needs only
``struct``: no compression in the supported profiles, so this is pure
header parsing + row reshuffling).

Scope: BITMAPINFOHEADER (40-byte DIB) files with BI_RGB (uncompressed)
pixel data at 24 bpp (BGR triples) or 8 bpp (palette); top-down and
bottom-up row orders; the 4-byte row padding rule. Everything else
(RLE, 16/32 bpp bitfields, OS/2 headers) raises ``NotImplementedError``
loudly — the honest-stub discipline.

Format reference: the public Windows BMP file-format documentation —
no code consulted.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_SIGNATURE = b"BM"


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode a BMP byte string to an HWC uint8 array (RGB — BGR input
    triples are swapped; palette images expand through their RGBQUAD
    table to RGB)."""
    if payload[:2] != BMP_SIGNATURE:
        raise ValueError("bmp_decode: not a BMP (bad signature)")
    if len(payload) < 54:
        raise ValueError("bmp_decode: truncated header")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size != 40:
        raise NotImplementedError(f"bmp_decode: DIB header size {dib_size}")
    w, h, planes, bpp, comp = struct.unpack_from("<iihHI", payload, 18)
    if comp != 0:
        raise NotImplementedError(f"bmp_decode: compression {comp}")
    if bpp not in (8, 24):
        raise NotImplementedError(f"bmp_decode: {bpp} bpp")
    if w <= 0 or h == 0:
        raise ValueError("bmp_decode: bad dimensions")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    data = payload[pix_off : pix_off + row_bytes * h]
    if len(data) != row_bytes * h:
        raise ValueError("bmp_decode: truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(bgr[:, :, ::-1])
    # 8-bit palette: RGBQUAD table (B, G, R, reserved) after the DIB
    (n_colors,) = struct.unpack_from("<I", payload, 46)
    n_colors = n_colors or 256
    pal_off = 14 + dib_size
    pal = np.frombuffer(
        payload[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
    ).reshape(-1, 4)
    if pal.shape[0] < n_colors:
        raise ValueError("bmp_decode: truncated palette")
    rgb = pal[:, [2, 1, 0]]  # BGRx → RGB
    idx = rows[:, :w]
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("bmp_decode: palette index out of range")
    return np.ascontiguousarray(rgb[idx])


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an HWC uint8 RGB array as an uncompressed 24-bpp
    bottom-up BMP — the test/fixture twin of :func:`bmp_decode`."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("bmp_encode: need HWC uint8 RGB")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return hdr + dib + bytes(body)
