"""Pure-stdlib WAV/PCM codec (struct + numpy reshape) — the r11
de-stub of the AUDIO modality, completing the PNG/BMP (r10) and JPEG
(r11) precedent: the multimodal plumbing gets a REAL audio decoder with
zero new dependencies. Unlike the image formats, PCM is LOSSLESS, so
every decoded sample is exactly the encoded integer and the catalog
oracle states closed forms with no construction tricks.

Scope, honestly bounded: RIFF/WAVE with 16-bit signed or 8-bit unsigned
PCM (format tag 1), any channel count, chunk-order agnostic (LIST/fact/
cue chunks before ``data`` are skipped per the RIFF contract).
IEEE-float (tag 3), A-law/µ-law (6/7), WAVE_FORMAT_EXTENSIBLE (0xFFFE),
and 24-bit depths raise ``NotImplementedError`` loudly — the honest-
stub discipline. The encoder exists so tests and catalog rows can
produce real WAV payloads deterministically.

Format reference: the public RIFF/WAVE specification (Microsoft/IBM
multimedia programming interface, 1991) — no code consulted.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIGNATURE = b"RIFF"


def wav_encode(
    samples: np.ndarray, *, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode an ``(n,)`` or ``(n, channels)`` integer sample array as
    a RIFF/WAVE PCM byte string. 16-bit input must fit int16; 8-bit
    input must fit 0..255 (unsigned, per the WAV convention)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("wav_encode: expected (n,) or (n, channels)")
    n, ch = samples.shape
    if bits == 16:
        if samples.min() < -(1 << 15) or samples.max() >= (1 << 15):
            raise ValueError("wav_encode: 16-bit samples out of range")
        data = samples.astype("<i2").tobytes()  # interleaved row-major
        block = 2 * ch
    elif bits == 8:
        if samples.min() < 0 or samples.max() > 255:
            raise ValueError("wav_encode: 8-bit samples out of range")
        data = samples.astype(np.uint8).tobytes()
        block = ch
    else:
        raise ValueError("wav_encode: bits must be 8 or 16")
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF word padding
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM byte string to ``(samples, sample_rate)``
    with ``samples`` an ``(n, channels)`` int16 array (8-bit input is
    centered to signed: ``(v − 128) · 256``, the standard widening).
    Raises ``ValueError`` on malformed bytes, ``NotImplementedError``
    on valid-but-unsupported variants (float, companded, extensible,
    24-bit)."""
    if payload[:4] != WAV_SIGNATURE or len(payload) < 12:
        raise ValueError("wav_decode: not a RIFF file")
    if payload[8:12] != b"WAVE":
        raise ValueError("wav_decode: RIFF but not WAVE")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav_decode: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < clen:
                raise ValueError("wav_decode: truncated data chunk")
            data = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav_decode: missing fmt/data chunk")
    tag, ch, rate, _byterate, _block, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"wav_decode: non-PCM format tag {tag} (float/companded/"
            "extensible unsupported)"
        )
    if ch < 1:
        raise ValueError("wav_decode: zero channels")
    if bits == 16:
        flat = np.frombuffer(data[: len(data) // (2 * ch) * 2 * ch], "<i2")
        out = flat.astype(np.int16)
    elif bits == 8:
        flat = np.frombuffer(data[: len(data) // ch * ch], np.uint8)
        out = ((flat.astype(np.int16) - 128) * 256).astype(np.int16)
    else:
        raise NotImplementedError(f"wav_decode: {bits}-bit PCM")
    return out.reshape(-1, ch), rate
