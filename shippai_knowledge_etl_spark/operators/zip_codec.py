"""Pure-stdlib ZIP codec, stored entries with REAL CRC-32 integrity
(PKWARE APPNOTE layout: local file headers, central directory, end of
central directory).

Round-11 ingestion widening, third container beside tar and WARC: zip
bundles are the other shape data dumps arrive in, and the format's
integrity primitive — CRC-32 (IEEE 802.3 polynomial, reflected,
init/final 0xFFFFFFFF) — is exactly the kind of byte-stream state
machine this repo's oracles replay declaratively (the IMA-ADPCM
precedent): crc' = (crc >> 8) XOR table[(crc XOR byte) & 0xFF] per
byte, a recursive CTE with a 256-entry table literal. The decoder
recomputes every entry's CRC from the stored bytes and REFUSES a
mismatch, so the gate covers both the container walk and the
checksum arithmetic.

The CRC implementation here is written from the polynomial (no
``zlib.crc32``), so the Python table and the SQL table literal are
the same derivation — one wrong table entry breaks both engines
identically never, and the planted-corruption pytest proves the
mismatch path fires.

Round 12 (VERDICT r11 item 4): DEFLATE (method 8) members — the
method real-world zips actually use. Compression rides stdlib zlib
raw-deflate (``wbits=-15``; the PNG codec set the zlib-dependency
precedent), and crucially the CRC-32 is defined over the INFLATED
bytes (APPNOTE 4.4.7), so verifying it makes the inflate itself
hash-witnessed: a wrong decompression cannot reproduce the stored
checksum, and the SQL oracle replaying the CRC recursion over the
original payload bytes gates stored and deflated members through the
same arithmetic.

Scope: stored (method 0) and deflate (method 8) entries, no zip64,
no encryption, no data descriptors; other methods raise
``NotImplementedError``; malformed structures and CRC mismatches
raise ``ValueError``.

Reference analog: bytes fetched, never unpacked
(src/render_pdf.py:90-98); archive handling is [EXT] surface.
"""

from __future__ import annotations

import struct

# CRC-32 table from the reflected polynomial 0xEDB88320, derived here
# (not imported) so the SQL literal in queries/multimodal.py is the
# same table by construction.
CRC_TABLE: tuple[int, ...] = tuple(
    (lambda c: [c := (c >> 1) ^ (0xEDB88320 if c & 1 else 0) for _ in range(8)][-1])(
        i
    )
    for i in range(256)
)


def crc32_bytes(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _raw_deflate(payload: bytes) -> bytes:
    import zlib

    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    return c.compress(payload) + c.flush()


def encode_zip(
    members: list[tuple[str, bytes]], methods: list[int] | None = None
) -> bytes:
    """members: [(name, payload)] → zip bytes; ``methods`` picks 0
    (stored, default) or 8 (deflate) per member."""
    if methods is None:
        methods = [0] * len(members)
    out = bytearray()
    central = bytearray()
    offsets = []
    stored = []  # (csize, crc) per member, reused for the directory
    for (name, payload), method in zip(members, methods):
        if method not in (0, 8):
            raise NotImplementedError(f"zip method {method}")
        nb = name.encode()
        crc = crc32_bytes(payload)
        data = _raw_deflate(payload) if method == 8 else payload
        stored.append((len(data), crc))
        offsets.append(len(out))
        out += b"PK\x03\x04"  # local file header
        out += struct.pack(
            "<HHHHHIIIHH",
            20,  # version needed
            0,  # flags
            method,
            0,  # mod time (deterministic)
            0x21,  # mod date (1980-01-01)
            crc,
            len(data),
            len(payload),
            len(nb),
            0,  # extra len
        )
        out += nb + data
    for (name, payload), method, off, (csize, crc) in zip(
        members, methods, offsets, stored
    ):
        nb = name.encode()
        central += b"PK\x01\x02"
        central += struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, method, 0, 0x21,
            crc,
            csize, len(payload),
            len(nb), 0, 0, 0, 0, 0,
            off,
        )
        central += nb
    cd_off = len(out)
    out += central
    out += b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_off, 0
    )
    return bytes(out)


def decode_zip(data: bytes) -> list[tuple[str, bytes, int, int]]:
    """zip bytes → [(name, payload, crc32, method)], walking the
    central directory (the authoritative index per APPNOTE) back to
    each local header, inflating method-8 members, and recomputing +
    VERIFYING every CRC against the (inflated) payload bytes."""
    eocd = data.rfind(b"PK\x05\x06")
    if eocd < 0:
        raise ValueError("missing end-of-central-directory")
    _d0, _d1, n_here, n_total, cd_size, cd_off, _clen = struct.unpack_from(
        "<HHHHIIH", data, eocd + 4
    )
    if n_here != n_total:
        raise NotImplementedError("multi-disk zip")
    out: list[tuple[str, bytes, int]] = []
    pos = cd_off
    for _ in range(n_total):
        if data[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError("bad central-directory signature")
        (
            _vmade, _vneed, _flags, method, _t, _dt, crc, csize, usize,
            nlen, elen, clen, _disk, _iattr, _eattr, off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        if method not in (0, 8):
            raise NotImplementedError(
                f"zip method {method} (stored and deflate only)"
            )
        name = data[pos + 46 : pos + 46 + nlen].decode()
        pos += 46 + nlen + elen + clen
        if data[off : off + 4] != b"PK\x03\x04":
            raise ValueError("bad local-header signature")
        (lnlen, lelen) = struct.unpack_from("<HH", data, off + 26)
        start = off + 30 + lnlen + lelen
        raw = data[start : start + csize]
        if len(raw) != csize:
            raise ValueError("zip payload overruns stream")
        if method == 8:
            import zlib

            try:
                payload = zlib.decompress(raw, -15)
            except zlib.error as e:
                raise ValueError(f"bad deflate stream for {name!r}: {e}")
        else:
            payload = raw
        if len(payload) != usize:
            raise ValueError(
                f"inflated size {len(payload)} != declared {usize}"
            )
        actual = crc32_bytes(payload)
        if actual != crc:
            raise ValueError(
                f"CRC mismatch for {name!r}: stored {crc:#010x}, "
                f"recomputed {actual:#010x}"
            )
        out.append((name, payload, crc, method))
    return out
