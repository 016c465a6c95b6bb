"""Pure-stdlib POSIX ustar codec (IEEE 1003.1 tar header format).

Round-11 ingestion widening: at 100 TB, training data does not arrive
as loose files — it arrives in ARCHIVES (tar shards, zip bundles,
WARC crawls), and the unpack step is part of the pipeline. This
module implements the ustar layer for real: 512-byte headers with
octal size fields, the header CHECKSUM computed over the header with
the checksum field blanked to spaces (the spec's one famous quirk),
512-byte payload block padding, and the two-zero-block terminator.
The decoder VERIFIES every header checksum and magic before trusting
a single size field, so a corrupted byte anywhere in a header fails
loudly rather than mis-framing the stream.

Scope (raises loudly outside it): regular files (typeflag '0'/NUL)
with ustar magic; directories, links, PAX/GNU extensions (longname,
sparse) raise ``NotImplementedError``; malformed headers, checksum
mismatches and truncated streams raise ``ValueError``.

Encoded headers are fully deterministic (fixed mode/uid/gid/mtime),
so byte-identical archives come out of both Arrow workers and tests.

Reference analog: the reference downloads bytes it never unpacks
(src/render_pdf.py:90-98); archive handling is beyond-reference [EXT]
surface.
"""

from __future__ import annotations

_BLOCK = 512
_MAGIC = b"ustar\x0000"  # POSIX magic 'ustar\0' + version '00'


def _octal(value: int, width: int) -> bytes:
    """NUL-terminated, zero-padded octal field of ``width`` bytes."""
    s = f"{value:0{width - 1}o}".encode()
    if len(s) >= width:
        raise ValueError(f"value {value} does not fit octal field {width}")
    return s + b"\x00"


def _header(name: str, size: int) -> bytes:
    nb = name.encode()
    if len(nb) > 100:
        raise NotImplementedError("name > 100 bytes needs GNU longname")
    h = bytearray(_BLOCK)
    h[0 : len(nb)] = nb
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime: deterministic epoch
    h[148:156] = b" " * 8  # checksum blanked to spaces for the sum
    h[156] = ord("0")  # typeflag: regular file
    h[257:265] = _MAGIC
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """members: [(name, payload)] → ustar archive bytes."""
    out = bytearray()
    for name, payload in members:
        out += _header(name, len(payload))
        out += payload
        out += b"\x00" * ((-len(payload)) % _BLOCK)
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def decode_tar(data: bytes) -> list[tuple[str, bytes]]:
    """ustar archive → [(name, payload)], checksum-verified."""
    if len(data) % _BLOCK:
        raise ValueError("tar stream is not block-aligned")
    members: list[tuple[str, bytes]] = []
    pos = 0
    while pos + _BLOCK <= len(data):
        h = data[pos : pos + _BLOCK]
        if h == b"\x00" * _BLOCK:  # terminator
            return members
        if h[257:263] != b"ustar\x00":
            raise ValueError("bad ustar magic")
        stored = int(h[148:156].split(b"\x00")[0].strip() or b"0", 8)
        blanked = bytearray(h)
        blanked[148:156] = b" " * 8
        if sum(blanked) != stored:
            raise ValueError("tar header checksum mismatch")
        typeflag = h[156:157]
        if typeflag not in (b"0", b"\x00"):
            raise NotImplementedError(
                f"tar typeflag {typeflag!r} (only regular files supported)"
            )
        name = h[0:100].split(b"\x00")[0].decode()
        size = int(h[124:136].split(b"\x00")[0].strip() or b"0", 8)
        pos += _BLOCK
        if pos + size > len(data):
            raise ValueError("tar payload overruns stream")
        members.append((name, data[pos : pos + size]))
        pos += size + ((-size) % _BLOCK)
    raise ValueError("tar stream missing terminator blocks")
