"""Pure-stdlib RIFF/WAVE PCM codec (encode + decode, bit-exact).

Round-9 follow-on to the PNG codec (VERDICT r8 stretch item): the
container has no soundfile/torchaudio, so the multimodal audio
real-decode branch raised unconditionally. Linear PCM WAV needs
nothing beyond ``struct`` — a RIFF container with ``fmt `` and
``data`` chunks (Microsoft/IBM RIFF spec, 1991; summarized in
McGill's canonical WAVE notes) — so this module makes the audio
decode path REAL end-to-end for PCM payloads while compressed audio
(MP3/AAC/ADPCM/float WAV) keeps the loud-raise posture.

Scope (raises loudly outside it): format tag 1 (integer PCM) and
0xFFFE (WAVE_FORMAT_EXTENSIBLE) whose SubFormat GUID is PCM; 8-bit
unsigned and 16-bit signed little-endian; any channel count; unknown
chunks (LIST, fact, cue) are skipped with correct odd-length padding.
IEEE-float (tag 3), A-law/mu-law (6/7), ADPCM (2/17) and 24/32-bit
depths raise ``NotImplementedError`` naming the reason.

Decoded samples are returned exactly as stored: 16-bit as signed
ints in [-32768, 32767], 8-bit as unsigned ints in [0, 255] (the WAV
convention), interleaved across channels — making every downstream
statistic integer-exact and hash-gateable.

Reference analog: the reference downloads media bytes it never
decodes (src/render_pdf.py:90-98); decoding is beyond-reference
[EXT] surface.
"""

from __future__ import annotations

import struct

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID for PCM: the 16-bit format tag
# followed by the fixed media-subtype suffix.
_PCM_SUBFORMAT = bytes.fromhex("0100000000001000800000aa00389b71")


def encode_wav(
    samples: list[int], sample_rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """Serialize interleaved integer samples to a canonical PCM WAV.

    ``samples`` is the interleaved stream (frame-major), so
    ``len(samples)`` must be a multiple of ``channels``. 16-bit takes
    signed values, 8-bit takes unsigned — the container's storage
    conventions, asserted here so a bad generator fails at encode
    time, not as silent wraparound.
    """
    if bits == 16:
        lo, hi, fmt_char = -32768, 32767, "h"
    elif bits == 8:
        lo, hi, fmt_char = 0, 255, "B"
    else:
        raise NotImplementedError(f"{bits}-bit PCM encode not supported")
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must be a positive multiple of channels")
    for s in samples:
        if not lo <= s <= hi:
            raise ValueError(f"sample {s} outside {bits}-bit PCM range")
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = struct.pack(f"<{len(samples)}{fmt_char}", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a WAV byte string → ``(sample_rate, channels, bits,
    interleaved samples)``.

    Walks the chunk list (tolerating LIST/fact/cue and odd-length
    padding), validates the format tag, and unpacks the data chunk
    exactly — no resampling, no normalization.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_fields = None
    pcm_bytes = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _byte_rate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == 0xFFFE:
                # Extensible: the real format lives in the SubFormat GUID
                # at offset 24 of the fmt body (after cbSize + union).
                if size < 40 or body[24:40] != _PCM_SUBFORMAT:
                    raise NotImplementedError(
                        "WAVE_FORMAT_EXTENSIBLE with non-PCM SubFormat"
                    )
                tag = 1
            if tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {tag} (only integer PCM is supported; "
                    "float/ADPCM/a-law need audio libs absent here)"
                )
            if bits not in (8, 16):
                raise NotImplementedError(f"{bits}-bit PCM decode not supported")
            fmt_fields = (rate, channels, bits)
        elif cid == b"data":
            pcm_bytes = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_fields is None or pcm_bytes is None:
        raise ValueError("missing fmt or data chunk")
    rate, channels, bits = fmt_fields
    if bits == 16:
        n = len(pcm_bytes) // 2
        samples = list(struct.unpack(f"<{n}h", pcm_bytes[: 2 * n]))
    else:
        samples = list(pcm_bytes)
    return rate, channels, bits, samples
