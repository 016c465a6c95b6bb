"""Pure-stdlib AVI container codec: RIFF 'AVI ' with ONE uncompressed
24-bit DIB video stream ('vids'/BI_RGB), from the public Microsoft
RIFF/AVI specification (avih / strl(strh, strf) headers + movi '00db'
frame chunks). The repo's first REAL video container path — before
this, the video modality (frame sampling, scene cuts) ran on
deterministic stub features; this makes the container walk, stream
validation, and per-frame pixel recovery genuine, the same step PNG/
WAV/GIF/BMP took for images and audio.

Frames are stored exactly as BMP pixel data (bottom-up rows, BGR byte
order, 4-byte row padding), so the decoder must undo the same three
transforms per frame AND preserve frame order — the closed-form
oracles gate the LAST frame's sum separately, which any frame
reordering or off-by-one in the chunk walk breaks.

Round 11 adds the Motion-JPEG branch (encode_avi_mjpeg /
decode_avi_mjpeg): fccHandler 'MJPG', biCompression 'MJPG', one
'00dc' chunk per frame holding a complete baseline JPEG decoded by
operators/jpeg_codec.py — the container+codec COMPOSITION legacy
camera corpora actually ship. Out-of-scope modes still raise
NotImplementedError loudly (multiple streams, other compressions,
idx1-dependent layouts): the multimodal posture of
operators/multimodal.py.
"""

from __future__ import annotations

import struct


def _pad2(n: int) -> int:
    return n & 1  # RIFF chunks pad to 16-bit boundaries


def _row_pad(width: int) -> int:
    return (-width * 3) % 4


def encode_avi_rgb24(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Minimal-but-valid AVI: avih + one 'vids' DIB stream + movi with
    one '00db' chunk per frame. Each frame is top-down RGB bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame length != w*h*3")
    pad = _row_pad(width)
    dibs = []
    for f in frames:
        body = bytearray()
        for y in range(height - 1, -1, -1):
            row = f[y * width * 3 : (y + 1) * width * 3]
            for x in range(width):
                r, g, b = row[3 * x : 3 * x + 3]
                body += bytes((b, g, r))
            body += b"\x00" * pad
        dibs.append(bytes(body))
    frame_bytes = len(dibs[0])

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (
            cid
            + struct.pack("<I", len(payload))
            + payload
            + b"\x00" * _pad2(len(payload))
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes/sec
        0,  # padding granularity
        # dwFlags = 0: no idx1 chunk is written, so AVIF_HASINDEX
        # (0x10) must stay clear — advertising an index the file lacks
        # would send strict third-party parsers chasing a missing
        # chunk (round-10 ADVICE). The in-repo decoder ignores flags.
        0,
        len(frames),
        0,
        1,  # one stream
        frame_bytes,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHH8I4H",
            0,  # flags
            0,  # priority
            0,  # language
            0,  # initial frames
            1,  # scale
            fps,  # rate
            0,  # start
            len(frames),  # length
            frame_bytes,  # suggested buffer
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (0 = one sample per chunk)
            0,
            0,
            width,
            height,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        height,
        1,
        24,
        0,
        frame_bytes,
        0,
        0,
        0,
        0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse an AVI byte string → (width, height, fps, n_frames,
    [top-down RGB frame bytes, in stream order]). Validates the single
    'vids' BI_RGB 24bpp stream; raises ValueError on malformed input
    and NotImplementedError on out-of-scope modes."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            yield cid, pos + 8, size
            pos += 8 + size + _pad2(size)

    width = height = fps = None
    n_frames_hdr = None
    frames: list[bytes] = []
    for cid, body, size in walk(data, 12, len(data)):
        if cid != b"LIST":
            continue
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            for c2, b2, s2 in walk(data, body + 4, body + size):
                if c2 == b"avih":
                    vals = struct.unpack_from("<IIIIIIIIII", data, b2)
                    n_frames_hdr = vals[4]
                    if vals[6] != 1:
                        raise NotImplementedError("multi-stream AVI")
                elif c2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in walk(data, b2 + 4, b2 + s2):
                        if c3 == b"strh":
                            if data[b3 : b3 + 4] != b"vids":
                                raise NotImplementedError(
                                    "non-video stream"
                                )
                            scale, rate = struct.unpack_from(
                                "<II", data, b3 + 20
                            )
                            if scale != 1:
                                raise NotImplementedError(
                                    "non-unit strh scale"
                                )
                            fps = rate
                        elif c3 == b"strf":
                            (
                                hdr_size,
                                width,
                                height,
                                _planes,
                                bpp,
                                comp,
                            ) = struct.unpack_from("<IiiHHI", data, b3)
                            if hdr_size != 40 or bpp != 24 or comp != 0:
                                raise NotImplementedError(
                                    "compressed or non-24bpp frames"
                                )
                            if height < 0:
                                raise NotImplementedError("top-down DIB")
        elif ltype == b"movi":
            for c2, b2, s2 in walk(data, body + 4, body + size):
                if c2 == b"00dc":
                    raise NotImplementedError(
                        "compressed frame chunk (MJPG streams go "
                        "through decode_avi_mjpeg)"
                    )
                if c2 != b"00db":
                    continue
                if width is None:
                    raise ValueError("movi before hdrl")
                pad = _row_pad(width)
                expected = (width * 3 + pad) * height
                if s2 != expected:
                    raise ValueError("frame chunk size mismatch")
                out = bytearray(width * height * 3)
                pos = b2
                for y in range(height - 1, -1, -1):
                    row = data[pos : pos + width * 3]
                    pos += width * 3 + pad
                    base = y * width * 3
                    for x in range(width):
                        bb, gg, rr = row[3 * x : 3 * x + 3]
                        out[base + 3 * x : base + 3 * x + 3] = bytes(
                            (rr, gg, bb)
                        )
                frames.append(bytes(out))
    if width is None or fps is None or n_frames_hdr is None:
        raise ValueError("missing AVI headers")
    if len(frames) != n_frames_hdr:
        raise ValueError("frame count disagrees with avih header")
    return width, height, fps, len(frames), frames


# 'MJPG' biCompression fourcc, little-endian
_MJPG_FOURCC = 0x47504A4D


def encode_avi_mjpeg(
    width: int, height: int, jpeg_frames: list[bytes], fps: int = 10
) -> bytes:
    """AVI with a Motion-JPEG video stream (round 11): same RIFF
    skeleton as encode_avi_rgb24 but fccHandler/biCompression 'MJPG'
    and one '00dc' (compressed) chunk per frame holding a complete
    baseline JPEG — the most common legacy camera/webcam capture
    format, and the container+codec COMPOSITION a real video corpus
    forces a pipeline to handle."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    for f in jpeg_frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame is not a JPEG (missing SOI)")
    max_bytes = max(len(f) for f in jpeg_frames)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (
            cid
            + struct.pack("<I", len(payload))
            + payload
            + b"\x00" * _pad2(len(payload))
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,
        max_bytes * fps,
        0,
        0,  # no idx1 chunk → AVIF_HASINDEX stays clear
        len(jpeg_frames),
        0,
        1,
        max_bytes,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHH8I4H",
            0, 0, 0, 0,
            1, fps, 0, len(jpeg_frames),
            max_bytes, 0xFFFFFFFF, 0,
            0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, _MJPG_FOURCC,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a Motion-JPEG AVI → (width, height, fps, [per-frame JPEG
    bytes, in stream order]). The container walk only — callers hand
    each frame to jpeg_codec.decode_jpeg. Uncompressed '00db' chunks
    in an MJPG stream raise ValueError; other stream types raise the
    usual NotImplementedError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            yield cid, pos + 8, size
            pos += 8 + size + _pad2(size)

    width = height = fps = None
    n_frames_hdr = None
    frames: list[bytes] = []
    for cid, body, size in walk(data, 12, len(data)):
        if cid != b"LIST":
            continue
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            for c2, b2, s2 in walk(data, body + 4, body + size):
                if c2 == b"avih":
                    vals = struct.unpack_from("<IIIIIIIIII", data, b2)
                    n_frames_hdr = vals[4]
                    if vals[6] != 1:
                        raise NotImplementedError("multi-stream AVI")
                elif c2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in walk(data, b2 + 4, b2 + s2):
                        if c3 == b"strh":
                            if data[b3 : b3 + 4] != b"vids":
                                raise NotImplementedError("non-video stream")
                            if data[b3 + 4 : b3 + 8] != b"MJPG":
                                raise NotImplementedError(
                                    "non-MJPG handler (use decode_avi "
                                    "for DIB streams)"
                                )
                            scale, rate = struct.unpack_from("<II", data, b3 + 20)
                            if scale != 1:
                                raise NotImplementedError("non-unit strh scale")
                            fps = rate
                        elif c3 == b"strf":
                            hdr_size, width, height, _pl, _bpp, comp = (
                                struct.unpack_from("<IiiHHI", data, b3)
                            )
                            if hdr_size != 40 or comp != _MJPG_FOURCC:
                                raise NotImplementedError(
                                    "strf compression is not MJPG"
                                )
        elif ltype == b"movi":
            for c2, b2, s2 in walk(data, body + 4, body + size):
                if c2 == b"00db":
                    raise ValueError("uncompressed chunk in MJPG stream")
                if c2 != b"00dc":
                    continue
                frame = data[b2 : b2 + s2]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError("frame chunk is not a JPEG")
                frames.append(frame)
    if width is None or fps is None or n_frames_hdr is None:
        raise ValueError("missing AVI headers")
    if len(frames) != n_frames_hdr:
        raise ValueError("frame count disagrees with avih header")
    return width, height, fps, frames
