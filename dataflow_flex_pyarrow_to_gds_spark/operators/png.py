"""Pure-stdlib PNG codec (zlib + struct) — de-stubs one real image
format behind the multimodal ``decode_fn`` contract (the reference
pipeline has no media surface at all — multimodal columns are part of
the LLM-training-data extension mandate) without adding any
dependency (this environment has no PIL/ffmpeg; zlib IS the stdlib).

Scope, honestly bounded: 8-bit-depth, non-interlaced PNGs in the five
standard color types (gray, RGB, palette, gray+alpha, RGBA), all five
scanline filters (None/Sub/Up/Average/Paeth — PNG spec §6). 16-bit and
Adam7-interlaced images raise ``NotImplementedError`` loudly — the same
honest-stub discipline as the fake decoder, now pushed two formats
deeper. The encoder exists so tests and catalog rows can produce real
PNG payloads deterministically; it writes one IDAT with a caller-chosen
filter per row, which doubles as the decoder's filter-coverage fixture.

Perf stance: Sub/Average/Paeth unfiltering is sequential in the left
neighbor, so those rows run a per-byte Python loop — fine for the
thumbnail-scale payloads the multimodal plumbing is exercised with, and
irrelevant to the Spark plan shape (decode cost lives inside the same
Arrow-batched ``mapInPandas`` slot a C codec would occupy; swapping in
PIL later changes THIS module only).

Format reference: the public PNG specification (RFC 2083 / W3C
PNG 1.2) — no code consulted.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG byte string to an HWC uint8 array (palette images
    are expanded to RGB; gray stays 1-channel, gray+alpha 2, RGBA 4).

    Raises ``ValueError`` on malformed bytes and ``NotImplementedError``
    on valid-but-unsupported variants (16-bit depth, Adam7 interlace).
    """
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("png_decode: not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("png_decode: truncated chunk")
        pos += 12 + length  # length + type + data + crc (crc unchecked)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("png_decode: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("png_decode: nonstandard compression/filter")
    if depth != 8:
        raise NotImplementedError(f"png_decode: bit depth {depth}")
    if interlace != 0:
        raise NotImplementedError("png_decode: Adam7 interlace")
    if color not in _CHANNELS:
        raise ValueError(f"png_decode: color type {color}")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("png_decode: bad decompressed size")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up (vectorizable, but rows are short — keep one shape)
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"png_decode: filter type {ft}")
        out[r] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("png_decode: palette image without PLTE")
        img = plte[img[:, :, 0]]
    return np.ascontiguousarray(img)


def png_encode(
    img: np.ndarray, *, filter_type: int | list[int] = 0
) -> bytes:
    """Encode an HWC uint8 array (1/2/3/4 channels) as a PNG byte
    string — one IHDR + one zlib IDAT + IEND, with ``filter_type``
    applied to every row (or a per-row list, which is how the tests
    exercise every unfilter branch of :func:`png_decode` against
    independently-written forward filters)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"png_encode: {ch} channels")
    if img.dtype != np.uint8:
        raise ValueError("png_encode: dtype must be uint8")
    fts = (
        list(filter_type)
        if isinstance(filter_type, (list, tuple))
        else [int(filter_type)] * h
    )
    if len(fts) != h:
        raise ValueError("png_encode: one filter per row")
    flat = img.reshape(h, w * ch)
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        line = flat[r].astype(np.int32)
        ft = fts[r]
        left = np.zeros(stride, dtype=np.int32)
        left[ch:] = line[:-ch]
        up_left = np.zeros(stride, dtype=np.int32)
        up_left[ch:] = prev[:-ch]
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - left
        elif ft == 2:
            enc = line - prev
        elif ft == 3:
            enc = line - ((left + prev) >> 1)
        elif ft == 4:
            enc = line.copy()
            for i in range(stride):
                enc[i] = line[i] - _paeth(
                    int(left[i]), int(prev[i]), int(up_left[i])
                )
        else:
            raise ValueError(f"png_encode: filter type {ft}")
        raw.append(ft)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
