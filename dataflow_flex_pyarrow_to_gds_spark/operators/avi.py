"""Pure-stdlib AVI codec for UNCOMPRESSED RGB video (struct + numpy) —
the r11 de-stub of the VIDEO modality, completing the image (PNG/BMP
r10, JPEG r11) and audio (WAV r11) precedent. AVI is the one video
container with a stdlib-feasible payload: BI_RGB device-independent
bitmap frames are raw bottom-up BGR rows (the BMP pixel rules, already
implemented for stills), so decode is chunk walking + row reshuffle —
LOSSLESS, hence exactly oracle-checkable with no construction tricks.

Scope, honestly bounded: RIFF 'AVI ' with ONE video stream ('vids'),
BI_RGB 24-bit frames ('00db'/'00dc' with biCompression 0), frame rate
from the stream header's rate/scale pair, optional idx1 ignored (movi
is scanned directly — index chunks are an optimization for seeking,
not a source of truth). Compressed codecs (MJPG, H.264, …), multiple
streams, audio interleaves, and ODML extensions raise
``NotImplementedError`` loudly — real video corpora are compressed and
need ffmpeg; THIS path exists so the Spark-side video plumbing
(1→N frame flatMap, per-frame stats, sampling cadence) is exercised by
a real container format instead of a hash stub.

Format reference: the public AVI RIFF specification (Microsoft Video
for Windows / OpenDML AVI file format extensions) — no code consulted.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_SIGNATURE = b"RIFF"


def _pad4(n: int) -> int:
    return (-n) % 4


def avi_encode(frames: np.ndarray, *, rate: int = 25, scale: int = 1) -> bytes:
    """Encode an ``(n_frames, h, w, 3)`` RGB uint8 array as an
    uncompressed-RGB AVI at ``rate/scale`` fps."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("avi_encode: expected (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError("avi_encode: empty video")
    row_bytes = w * 3 + _pad4(w * 3)

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[::-1, :, ::-1]  # bottom-up rows, BGR channel order
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    frame_bytes = [dib(frames[i]) for i in range(n)]
    usec_per_frame = scale * 1_000_000 // rate

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, row_bytes * h * rate // scale, 0, 0x10,  # HASINDEX
        n, 0, 1, row_bytes * h, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, scale, rate, 0, n,
        row_bytes * h, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 0, 0, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + b"\x00" * (
            len(body) % 2
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00db", fb) for fb in frame_bytes)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list body start)
    idx_entries = []
    off = 4  # past the 'movi' kind tag
    for fb in frame_bytes:
        idx_entries.append(
            struct.pack("<4sIII", b"00db", 0x10, off, len(fb))
        )
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen % 2)


def avi_decode(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode an uncompressed-RGB AVI to ``(frames, rate, scale)`` with
    ``frames`` an ``(n, h, w, 3)`` RGB uint8 array and ``rate/scale``
    the frame rate. Raises ``ValueError`` on malformed bytes,
    ``NotImplementedError`` on compressed codecs / non-24-bit DIBs /
    multi-stream files."""
    d = payload
    if d[:4] != AVI_SIGNATURE or len(d) < 12:
        raise ValueError("avi_decode: not a RIFF file")
    if d[8:12] != b"AVI ":
        raise ValueError("avi_decode: RIFF but not AVI")

    rate = scale = None
    w = h = None
    n_streams = 0
    frames_raw: list[bytes] = []

    def walk_list(pos: int, end: int) -> None:
        nonlocal rate, scale, w, h, n_streams
        for cid, body_at, clen in _walk_chunks(d, pos, end):
            if cid == b"LIST":
                kind = d[body_at:body_at + 4]
                if kind == b"strl":
                    n_streams += 1
                    if n_streams > 1:
                        raise NotImplementedError(
                            "avi_decode: multiple streams"
                        )
                walk_list(body_at + 4, body_at + clen)
            elif cid == b"strh":
                fcc_type, fcc_handler = d[body_at:body_at + 4], d[
                    body_at + 4:body_at + 8
                ]
                if fcc_type != b"vids":
                    raise NotImplementedError(
                        f"avi_decode: non-video stream {fcc_type!r}"
                    )
                scale_, rate_ = struct.unpack(
                    "<II", d[body_at + 20:body_at + 28]
                )
                scale, rate = max(scale_, 1), rate_
            elif cid == b"strf":
                (size, bw, bh, _planes, bits, comp) = struct.unpack(
                    "<IiiHHI", d[body_at:body_at + 20]
                )
                if comp != 0:
                    raise NotImplementedError(
                        f"avi_decode: compressed codec {comp:#x} "
                        "(only BI_RGB supported)"
                    )
                if bits != 24:
                    raise NotImplementedError(
                        f"avi_decode: {bits}-bit DIB (only 24-bit)"
                    )
                w, h = bw, abs(bh)
            elif cid in (b"00db", b"00dc"):
                frames_raw.append(d[body_at:body_at + clen])

    walk_list(12, len(d))
    if rate is None or w is None:
        raise ValueError("avi_decode: missing strh/strf headers")
    if not frames_raw:
        raise ValueError("avi_decode: no frames")
    row_bytes = w * 3 + _pad4(w * 3)
    out = np.zeros((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        if len(fb) < row_bytes * h:
            raise ValueError(f"avi_decode: truncated frame {i}")
        rows = np.frombuffer(fb[: row_bytes * h], np.uint8).reshape(
            h, row_bytes
        )
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        out[i] = bgr[::-1, :, ::-1]  # un-flip rows, BGR→RGB
    return out, rate, scale
