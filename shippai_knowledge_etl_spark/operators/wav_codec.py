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
Round 10 adds format tag 7 (G.711 mu-law, ITU-T G.711 1988 — the
8 kHz telephony companding every speech corpus ships in): stored
bytes expand to linear through the standard segment/mantissa table
arithmetic (``mulaw_expand``), and ``encode_wav_mulaw`` compresses
16-bit linear to the container. IEEE-float (tag 3), A-law (6),
ADPCM (2/17) and 24/32-bit depths raise ``NotImplementedError``
naming the reason.

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

# G.711 mu-law constants (the Sun/CCITT g711 convention: bias the
# magnitude by 0x84 so the segment search is a pure bit test).
_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_compress(x: int) -> int:
    """16-bit linear sample → one mu-law byte (ITU-T G.711).

    Magnitude clips at 32635, biases by 132, the segment e in 0..7 is
    the position of the top set bit above bit 7, the mantissa the next
    4 bits; the byte stores the ones' complement of sign|seg|mantissa
    (all-zero bytes would upset T1 repeaters — the spec's inversion).
    """
    sign = 0x80 if x < 0 else 0
    a = -x if x < 0 else x
    if a > _MULAW_CLIP:
        a = _MULAW_CLIP
    a += _MULAW_BIAS
    e, mask = 7, 0x4000
    while e > 0 and not (a & mask):
        mask >>= 1
        e -= 1
    mantissa = (a >> (e + 3)) & 0x0F
    return ~(sign | (e << 4) | mantissa) & 0xFF


def mulaw_expand(b: int) -> int:
    """One mu-law byte → the reconstructed linear sample: invert,
    rebuild ((mantissa·8 + 132) << seg) − 132, apply sign. Exact
    integer arithmetic — the decode table of every G.711 codec."""
    b = ~b & 0xFF
    e = (b >> 4) & 0x07
    mag = ((((b & 0x0F) << 3) + _MULAW_BIAS) << e) - _MULAW_BIAS
    return -mag if b & 0x80 else mag


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


def encode_wav_mulaw(
    samples: list[int], sample_rate: int, channels: int = 1
) -> bytes:
    """Compress interleaved 16-bit linear samples to a mu-law WAV
    (format tag 7, 8 bits stored). Same container layout as PCM with
    the G.711 byte stream in the data chunk."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must be a positive multiple of channels")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} outside 16-bit linear range")
    data = bytes(mulaw_compress(s) for s in samples)
    block_align = channels  # 1 byte per sample per channel
    fmt = struct.pack(
        "<HHIIHH", 7, channels, sample_rate, sample_rate * block_align,
        block_align, 8,
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
    exactly — no resampling, no normalization. For format tag 7
    (G.711 mu-law) the returned samples are the EXPANDED linear values
    (``mulaw_expand`` per stored byte) while ``bits`` reports the
    8-bit storage width.
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
            if tag == 7:
                if bits != 8:
                    raise ValueError(f"mu-law with {bits}-bit storage")
            elif tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {tag} (integer PCM and G.711 mu-law "
                    "are supported; float/ADPCM/a-law need audio libs "
                    "absent here)"
                )
            elif bits not in (8, 16):
                raise NotImplementedError(f"{bits}-bit PCM decode not supported")
            fmt_fields = (rate, channels, bits, tag)
        elif cid == b"data":
            pcm_bytes = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_fields is None or pcm_bytes is None:
        raise ValueError("missing fmt or data chunk")
    rate, channels, bits, tag = fmt_fields
    if tag == 7:
        # mu-law: stored width is 8 but the DECODED samples are the
        # expanded linear values — that is what decoding means here;
        # bits reports the storage width per the WAV convention
        samples = [mulaw_expand(b) for b in pcm_bytes]
    elif bits == 16:
        n = len(pcm_bytes) // 2
        samples = list(struct.unpack(f"<{n}h", pcm_bytes[: 2 * n]))
    else:
        samples = list(pcm_bytes)
    return rate, channels, bits, samples
