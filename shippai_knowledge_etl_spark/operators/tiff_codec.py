"""Pure-stdlib baseline TIFF codec (TIFF 6.0, Adobe 1992).

Round-11 container widening (the PNG/GIF/BMP/AVI/JPEG discipline):
TIFF is what scan/document/scientific corpora arrive in, and unlike
the other containers it is TAG-structured — the decoder must walk an
IFD (Image File Directory) of typed tag entries with inline-or-offset
values, honor the byte order declared in the header (both II and MM
are real in the wild and both are exercised by the generators), and
reassemble the image from MULTIPLE strips. The compressed branch is
PackBits (Apple run-length, TIFF compression 32773): a REAL RLE
codec — literal runs, repeat runs, the -128 noop — whose encoder
detects runs and whose decoder expands them byte-exactly.

Scope (raises loudly outside it): 8-bit single-sample grayscale
(PhotometricInterpretation 1, BlackIsZero), strip-organized,
compression 1 (none) or 32773 (PackBits). Tiled images, multi-sample
(RGB/CMYK), other bit depths, other compressions (LZW/CCITT/JPEG),
BigTIFF (magic 43) and planar configurations raise
``NotImplementedError`` naming the reason; malformed structures raise
``ValueError``.

Reference analog: ``download_image`` (src/render_pdf.py:90-98)
returns raw bytes the reference never decodes; decoding is
beyond-reference [EXT] surface.
"""

from __future__ import annotations

import struct

# tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_TILE_WIDTH = 322
_T_PLANAR = 284


def packbits_encode(data: bytes) -> bytes:
    """Real PackBits: greedy run detection — repeats of ≥3 become
    (257-n, byte) repeat packets, everything else literal packets of
    up to 128 bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal: scan forward until a ≥3 run starts or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 3 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Expand PackBits to exactly ``expected`` bytes (TIFF §9: each
    strip decompresses independently to its own size)."""
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("PackBits stream exhausted early")
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:  # literal of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("PackBits literal overruns stream")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("PackBits repeat missing byte")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits output overruns expected size")
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    compression: int = 1,
    rows_per_strip: int = 4,
    big_endian: bool = False,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major) as a strip-organized
    baseline TIFF in either byte order."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match geometry")
    if compression not in (1, 32773):
        raise ValueError(f"unsupported compression {compression}")
    e = ">" if big_endian else "<"
    strips = []
    for y0 in range(0, height, rows_per_strip):
        raw = pixels[y0 * width : min(y0 + rows_per_strip, height) * width]
        strips.append(packbits_encode(raw) if compression == 32773 else raw)
    n_strips = len(strips)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # SHORT values sit in the upper... no: values are LEFT-justified
        # in the 4-byte field, i.e. written in byte order at offset 0
        if typ == 3:
            return struct.pack(f"{e}HHIHH", tag, typ, count, value, 0)
        return struct.pack(f"{e}HHII", tag, typ, count, value)

    # layout: header(8) + IFD + offset arrays + strip data
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    arrays_at = 8 + ifd_size
    need_arrays = n_strips > 1
    off_array_at = arrays_at
    cnt_array_at = arrays_at + (4 * n_strips if need_arrays else 0)
    data_at = cnt_array_at + (4 * n_strips if need_arrays else 0)
    offsets = []
    pos = data_at
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    ifd = struct.pack(f"{e}H", n_entries)
    ifd += entry(_T_WIDTH, 3, 1, width)
    ifd += entry(_T_HEIGHT, 3, 1, height)
    ifd += entry(_T_BITS, 3, 1, 8)
    ifd += entry(_T_COMPRESSION, 3, 1, compression)
    ifd += entry(_T_PHOTOMETRIC, 3, 1, 1)  # BlackIsZero
    if need_arrays:
        ifd += entry(_T_STRIP_OFFSETS, 4, n_strips, off_array_at)
    else:
        ifd += entry(_T_STRIP_OFFSETS, 4, 1, offsets[0])
    ifd += entry(_T_SAMPLES_PER_PIXEL, 3, 1, 1)
    ifd += entry(_T_ROWS_PER_STRIP, 3, 1, rows_per_strip)
    if need_arrays:
        ifd += entry(_T_STRIP_COUNTS, 4, n_strips, cnt_array_at)
    else:
        ifd += entry(_T_STRIP_COUNTS, 4, 1, len(strips[0]))
    ifd += struct.pack(f"{e}I", 0)  # next IFD

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(f"{e}H", 42)
    out += struct.pack(f"{e}I", 8)
    out += ifd
    if need_arrays:
        out += struct.pack(f"{e}{n_strips}I", *offsets)
        out += struct.pack(f"{e}{n_strips}I", *(len(s) for s in strips))
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale TIFF → (width, height, pixels)."""
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(f"{e}H", data, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF")
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (ifd_at,) = struct.unpack_from(f"{e}I", data, 4)
    if ifd_at + 2 > len(data):
        raise ValueError("IFD offset outside file")
    (n_entries,) = struct.unpack_from(f"{e}H", data, ifd_at)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_entries):
        off = ifd_at + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{e}HHI", data, off)
        if typ == 3 and count == 1:
            (value,) = struct.unpack_from(f"{e}H", data, off + 8)
        else:
            (value,) = struct.unpack_from(f"{e}I", data, off + 8)
        tags[tag] = (typ, count, value)

    def req(tag: int, default: int | None = None) -> tuple[int, int, int]:
        if tag not in tags:
            if default is not None:
                return (3, 1, default)
            raise ValueError(f"missing required TIFF tag {tag}")
        return tags[tag]

    if _T_TILE_WIDTH in tags:
        raise NotImplementedError("tiled TIFF")
    width = req(_T_WIDTH)[2]
    height = req(_T_HEIGHT)[2]
    bits = req(_T_BITS, 1)[2]
    if bits != 8:
        raise NotImplementedError(f"{bits}-bit TIFF samples")
    spp = req(_T_SAMPLES_PER_PIXEL, 1)[2]
    if spp != 1:
        raise NotImplementedError(f"{spp}-sample TIFF (RGB/CMYK)")
    comp = req(_T_COMPRESSION, 1)[2]
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    photo = req(_T_PHOTOMETRIC)[2]
    if photo != 1:
        raise NotImplementedError(f"photometric interpretation {photo}")
    planar = req(_T_PLANAR, 1)[2]
    if planar != 1:
        raise NotImplementedError("planar configuration 2")
    rps = req(_T_ROWS_PER_STRIP, height)[2]

    def array(tag: int) -> list[int]:
        typ, count, value = req(tag)
        fmt = "H" if typ == 3 else "I"
        width_b = 2 if typ == 3 else 4
        if count == 1:
            return [value]
        if count * width_b <= 4:
            raise NotImplementedError("packed short strip arrays")
        return list(struct.unpack_from(f"{e}{count}{fmt}", data, value))

    offsets = array(_T_STRIP_OFFSETS)
    counts = array(_T_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise ValueError("strip offset/count arrays disagree")
    expected_strips = -(-height // rps)
    if len(offsets) != expected_strips:
        raise ValueError("strip count does not match rows-per-strip")
    pixels = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(data):
            raise ValueError("strip outside file")
        rows = min(rps, height - si * rps)
        raw = data[o : o + c]
        if comp == 32773:
            raw = packbits_decode(raw, rows * width)
        elif len(raw) != rows * width:
            raise ValueError("uncompressed strip size mismatch")
        pixels += raw
    return width, height, bytes(pixels)
