"""Pure-stdlib WARC/1.0 codec (ISO 28500 — the Common Crawl format).

Round-11 ingestion widening: WARC is THE arrival format of web-scale
pretraining data (Common Crawl ships it by the petabyte), so parsing
it correctly is a first-class pipeline operator, not an edge. The
crucial correctness property is Content-Length FRAMING: record
payloads are raw bytes that may legally contain ``\\r\\n\\r\\n`` and
even strings that look like record headers, so any split-on-blank-line
parser silently mis-frames — this codec's generators deliberately
embed a blank line AND a fake ``WARC/1.0`` marker inside every
response body, and the decoder must walk by byte count to survive.

Record layout (WARC 1.0 §4): version line, named headers, CRLF CRLF,
``Content-Length`` payload bytes, CRLF CRLF separator. Response
records carry an HTTP/1.1 message as payload; its status line and
headers are parsed too (split at the FIRST blank line — inside the
HTTP payload that is legal because the generators put the boobytrap
in the HTTP body, which stays opaque bytes).

Round 12 (VERDICT r11 item 4): member-wise GZIP — the actual Common
Crawl arrival format is one gzip member PER RECORD, concatenated
(that is what makes offset-indexed random access into a .warc.gz
possible), so :func:`decode_warc_auto` walks gzip members one
``zlib.decompressobj(wbits=31)`` at a time via ``unused_data``
chaining and REQUIRES each member to frame exactly one record — a
whole-stream ``gzip.decompress`` would silently accept broken
per-record framing that real index-based readers choke on.

Scope: warcinfo / response records, byte-exact framing, plain or
member-gzipped streams. Unknown WARC-Type raises
``NotImplementedError``; missing mandatory headers, bad version
lines, framing errors and truncated gzip members raise
``ValueError``.

Reference analog: the reference fetches live pages one URL at a time
(src/extract.py:36); consuming an at-rest crawl archive is the [EXT]
scale counterpart.
"""

from __future__ import annotations

_CRLF = b"\r\n"


def encode_warc(records: list[dict]) -> bytes:
    """records: [{'type': 'warcinfo'|'response', 'uri': str|None,
    'record_id': str, 'payload': bytes}] → WARC/1.0 bytes."""
    out = bytearray()
    for r in records:
        headers = [
            ("WARC-Type", r["type"]),
            ("WARC-Record-ID", f"<urn:uuid:{r['record_id']}>"),
            ("WARC-Date", "2026-01-01T00:00:00Z"),  # deterministic
        ]
        if r.get("uri"):
            headers.append(("WARC-Target-URI", r["uri"]))
        headers.append(("Content-Length", str(len(r["payload"]))))
        out += b"WARC/1.0" + _CRLF
        for k, v in headers:
            out += f"{k}: {v}".encode() + _CRLF
        out += _CRLF
        out += r["payload"]
        out += _CRLF + _CRLF
    return bytes(out)


def http_response(status: int, body: bytes) -> bytes:
    """A minimal deterministic HTTP/1.1 payload for response records."""
    return (
        f"HTTP/1.1 {status} OK".encode()
        + _CRLF
        + b"Content-Type: text/plain"
        + _CRLF
        + f"Content-Length: {len(body)}".encode()
        + _CRLF
        + _CRLF
        + body
    )


def encode_warc_gzip(records: list[dict]) -> bytes:
    """records → member-wise .warc.gz bytes: each record's plain WARC
    serialization compressed as its OWN gzip member (mtime pinned to 0
    for determinism), members concatenated — the Common Crawl layout."""
    import gzip

    out = bytearray()
    for r in records:
        out += gzip.compress(encode_warc([r]), compresslevel=9, mtime=0)
    return bytes(out)


def decode_warc_auto(data: bytes) -> tuple[list[dict], int]:
    """Plain or gzipped WARC bytes → (records, n_gzip_members).

    Gzip streams (1F 8B magic) are walked member by member; each
    member must inflate to exactly one record (the per-record framing
    contract real .warc.gz index readers depend on), so
    ``n_gzip_members == len(records)`` for gzipped input; plain input
    reports 0 members."""
    if data[:2] != b"\x1f\x8b":
        return decode_warc(data), 0
    import zlib

    records: list[dict] = []
    n = 0
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(rest)
        except zlib.error as e:
            raise ValueError(f"bad gzip member: {e}")
        if not d.eof:
            raise ValueError("truncated gzip member")
        recs = decode_warc(member)
        if len(recs) != 1:
            raise ValueError(
                f"gzip member frames {len(recs)} records (expected 1 — "
                "per-record members are the .warc.gz contract)"
            )
        records.extend(recs)
        n += 1
        rest = d.unused_data
    return records, n


def decode_warc(data: bytes) -> list[dict]:
    """WARC bytes → [{'type', 'uri', 'status', 'body'}], framed by
    Content-Length (NOT by blank-line splitting — see module header).

    For response records the HTTP payload is split at its first blank
    line; ``status`` is the parsed status code and ``body`` the raw
    HTTP body bytes. warcinfo records return status None and the
    whole payload as body."""
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = data[pos:eol]
        if version != b"WARC/1.0":
            raise ValueError(f"bad WARC version line {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode().strip().lower()] = v.decode().strip()
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["content-length"])
        if pos + length > n:
            raise ValueError("WARC payload overruns stream")
        payload = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing CRLF CRLF separator")
        pos += 4
        rtype = headers.get("warc-type")
        if rtype == "warcinfo":
            records.append(
                {"type": rtype, "uri": None, "status": None, "body": payload}
            )
        elif rtype == "response":
            sep = payload.find(_CRLF + _CRLF)
            if sep < 0:
                raise ValueError("HTTP payload missing header terminator")
            status_line = payload.split(_CRLF, 1)[0]
            parts = status_line.split(b" ")
            if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                raise ValueError("bad HTTP status line")
            records.append(
                {
                    "type": rtype,
                    "uri": headers.get("warc-target-uri"),
                    "status": int(parts[1]),
                    "body": payload[sep + 4 :],
                }
            )
        else:
            raise NotImplementedError(f"WARC-Type {rtype!r}")
    return records
