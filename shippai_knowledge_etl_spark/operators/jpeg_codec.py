"""Pure stdlib+numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Round-11 stretch (VERDICT r10 item 7 named it): JPEG is the most
common image format in any real crawl, and it was the one image
container still env-forced to the loud-raise branch (no Pillow in
this container). This module implements the BASELINE process for
real: canonical Huffman tables built from BITS/HUFFVAL, DC difference
coding with restart-interval predictor resets, AC run/size
run-length coding with ZRL and EOB, byte stuffing (FF 00), zigzag
(de)serialization, 8-bit quantization tables, interleaved MCU scans
with arbitrary (h, v) sampling factors (4:4:4 and 4:2:0 both
exercised), dequantization, a separable float64 IDCT with libjpeg's
DC-only shortcut, level shift, and the JFIF YCbCr→RGB conversion.

Rounding discipline (the cross-engine hash-gate contract):
  - every pixel rounding is floor(x + 0.5) — T.81 does not mandate a
    rounding mode, and floor(x+0.5) is integer-replayable in SQL;
  - a block whose AC coefficients are ALL zero decodes through the
    exact integer shortcut pixel = (dequant_dc + 1028) >> 3 (libjpeg's
    `dcval` shortcut in jidctint.c exists for the same reason: a
    DC-only block is flat, so the full IDCT is a waste AND a source
    of float noise). The float IDCT path handles every AC-bearing
    block and is pinned against an independent basis-summation
    reference in tests/test_multimodal.py;
  - the YCbCr→RGB floats use the JFIF constants in a FIXED operand
    order (r = y + 1.402·(cr−128), g = y − 0.344136·(cb−128) −
    0.714136·(cr−128), b = y + 1.772·(cb−128)), so a SQL oracle
    computing the identical double expressions matches bit-for-bit.

Round 12 adds the PROGRESSIVE process (SOF2, T.81 Annex G) — the
remaining mass of any crawl's image bytes (VERDICT r11 missing #1):
spectral selection (per-component AC band scans; DC scans may be
interleaved), successive approximation (point transform: arithmetic
shift for DC, magnitude shift toward zero for AC; refinement scans
carry one correction bit per already-nonzero coefficient and ±1
significance codes for new ones), EOB-run coding (EOBn symbols with
appended run-length bits), per-scan Huffman tables built by the
T.81 Annex K.2 optimal-length procedure (the standard Annex K tables
lack the EOBn symbols progressive scans need), and restart markers
resetting both the DC predictors and the EOB run. Successive
approximation is lossless once every scan reaches Al=0, so a
complete progressive decode reconstructs EXACTLY the coefficients of
the equivalent baseline stream — the equivalence the tests and the
``mm_jpeg_progressive`` gate pin.

Scope (raises loudly outside it): baseline sequential DCT (SOF0) and
progressive DCT (SOF2), 8-bit precision, Huffman coding. Extended
sequential (SOF1), lossless/hierarchical, arithmetic coding (SOF9+),
12-bit precision and DNL raise ``NotImplementedError`` with the
reason; malformed streams raise ``ValueError``.

Reference analog: ``download_image`` (src/render_pdf.py:90-98)
fetches JPEGs and embeds the bytes in PDFs without decoding; decoding
is beyond-reference [EXT] surface.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = natural (row-major) index of the k-th
# zigzag-ordered coefficient (T.81 figure A.6)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# Standard Huffman table specs (T.81 Annex K.3): (BITS[1..16], HUFFVAL)
DC_LUM_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUM_VALS = tuple(range(12))
DC_CHR_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHR_VALS = tuple(range(12))
AC_LUM_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUM_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)
AC_CHR_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHR_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """value → (code, length) by the canonical algorithm (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals) -> dict[int, int]:
    """(1 << length) | code → value — the decoder-side canonical map.
    The 1-prefix makes codes of different lengths distinct under one
    INT key (round-13, guide §4.2: the (length, code) tuple key paid a
    tuple alloc + tuple hash per candidate length per symbol; the
    lookup sequence is otherwise unchanged)."""
    return {
        (1 << ln) | code: v
        for v, (code, ln) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    """MSB-first bit packer with JPEG FF-stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        # batched byte emission (round-12, guide §4.2 — the per-bit
        # loop was one Python iteration per OUTPUT BIT of every scan;
        # this emits the identical MSB-first bit sequence, so payloads
        # are byte-identical): append whole bytes off the top of the
        # accumulator, keep the sub-byte remainder
        acc = (self.acc << width) | (code & ((1 << width) - 1))
        nbits = self.nbits + width
        out = self.out
        while nbits >= 8:
            nbits -= 8
            b = (acc >> nbits) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits

    def byte_align(self) -> None:
        """Pad the current byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1  # one's-complement convention
    return size, v


def _encode_block(bw, coeffs, dc_codes, ac_codes, pred: int) -> int:
    """Huffman-encode one quantized block (natural order); returns
    the new DC predictor."""
    zz = [coeffs[ZIGZAG[k]] for k in range(64)]
    diff = zz[0] - pred
    size, extra = _magnitude_bits(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(extra, size)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, extra = _magnitude_bits(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(extra, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return zz[0]


def encode_jpeg(
    width: int,
    height: int,
    components: list[dict],
    restart_interval: int = 0,
) -> bytes:
    """Encode a baseline JFIF JPEG from QUANTIZED coefficient blocks.

    ``components``: 1 (grayscale) or 3 (YCbCr) dicts with keys
      - ``coeffs``: list[by][bx] of 64-int sequences (quantized,
        NATURAL row-major order);
      - ``q``: 64-int quantization table (natural order);
      - ``hv``: (h_samp, v_samp) sampling factors.
    Component block grids must exactly tile width×height at their
    sampling ratios (the deterministic generators guarantee this);
    anything else raises ValueError. Huffman tables are the Annex K
    standard set (DC/AC 0 for component 0, DC/AC 1 for the rest).
    """
    ncomp = len(components)
    if ncomp not in (1, 3):
        raise ValueError(f"encode_jpeg supports 1 or 3 components, got {ncomp}")
    hmax = max(c["hv"][0] for c in components)
    vmax = max(c["hv"][1] for c in components)
    if width % (8 * hmax) or height % (8 * vmax):
        raise ValueError("dimensions must tile the MCU grid exactly")
    mcux, mcuy = width // (8 * hmax), height // (8 * vmax)
    for c in components:
        h, v = c["hv"]
        if len(c["coeffs"]) != mcuy * v or len(c["coeffs"][0]) != mcux * h:
            raise ValueError("coefficient grid does not match geometry")

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    # DQT (tables stored in zigzag order per B.2.4.1)
    for i, c in enumerate(components[:2]):  # table 0 = luma, 1 = chroma
        zz = bytes(c["q"][ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, i) + zz
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for i, c in enumerate(components):
        h, v = c["hv"]
        out += struct.pack(">BBB", i + 1, (h << 4) | v, min(i, 1))
    # DHT
    tables = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if ncomp == 3:
        tables += [
            (0x01, DC_CHR_BITS, DC_CHR_VALS),
            (0x11, AC_CHR_BITS, AC_CHR_VALS),
        ]
    for tc_th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        t = min(i, 1)
        out += struct.pack(">BB", i + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)
    huff = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (ncomp - 1)

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.byte_align()
            bw.out += b"\xff" + bytes([0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(components):
            h, v = c["hv"]
            for by in range(v):
                for bx in range(h):
                    blk = c["coeffs"][my * v + by][mx * h + bx]
                    preds[ci] = _encode_block(
                        bw, blk, huff[ci][0], huff[ci][1], preds[ci]
                    )
    bw.byte_align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first entropy-segment reader: unstuffs FF 00, stops at any
    other marker and exposes it via ``marker``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy segment exhausted mid-block")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise _MarkerHit()
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        # batched extraction (round-12, guide §4.2): fill whole bytes
        # until n bits are buffered, then one shift+mask — the same
        # bytes are pulled in the same order as the per-bit loop, so
        # marker/stuffing behavior is unchanged
        if n <= 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    """Internal: a non-stuffing marker interrupted the bit stream."""


def _decode_huffman(br: _BitReader, table: dict[int, int]) -> int:
    # bit consumption inlined against the reader's buffer (round-12,
    # guide §4.2: one method call per bit was ~40% of entropy-decode
    # time); stale high accumulator bits are harmless — reads only ever
    # touch the low ``nbits`` bits, exactly as read_bit did. The
    # running ``code`` carries the 1-prefix of the int-keyed table, so
    # each candidate length is one int dict probe (round 13).
    code = 1
    get = table.get
    for _length in range(16):
        if br.nbits == 0:
            br._fill()
        br.nbits -= 1
        code = (code << 1) | ((br.acc >> br.nbits) & 1)
        v = get(code)
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map appended bits back to a signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# orthonormal 1-D DCT-II basis: M[u, x] = C(u)/2 · cos((2x+1)uπ/16)
_IDCT_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def _idct_block(coeffs: np.ndarray) -> np.ndarray:
    """Dequantized 8×8 block → pixel block (uint8-ranged ints).

    DC-only shortcut (libjpeg's `dcval` path, jidctint.c): a block
    with zero AC is exactly flat at dc/8 + 128, so the pixel is the
    exact integer (dc + 1028) >> 3 — no float exists to diverge from
    a SQL replay. AC-bearing blocks run the separable float64 IDCT
    with floor(x+0.5) rounding and [0,255] clipping.
    """
    if not coeffs[1:].any():
        dc = int(coeffs[0])
        val = (dc + 1028) >> 3
        val = 0 if val < 0 else 255 if val > 255 else val
        return np.full((8, 8), val, dtype=np.int64)
    f = coeffs.reshape(8, 8).astype(np.float64)
    pix = _IDCT_M.T @ f @ _IDCT_M
    out = np.floor(pix + 128.0 + 0.5)
    return np.clip(out, 0.0, 255.0).astype(np.int64)


def _idct_plane(deq: np.ndarray) -> np.ndarray:
    """Dequantized coefficient grid (nby, nbx, 64) → pixel plane
    (nby·8, nbx·8) int64 in ONE vectorized pass over every block
    (round-13, guide §4.2 — the per-block `_idct_block` loop paid a
    Python call + several small-array numpy dispatches per 8×8 block;
    the batched form runs two broadcast matmuls for the whole plane).

    Exactness: the float path evaluates the same `M.T @ f @ M` per
    block (batched matmul is per-block independent — each output cell
    is the same 8-term dot products) with the same
    `floor(pix + 128.0 + 0.5)` rounding; DC-only blocks are then
    OVERWRITTEN with `_idct_block`'s exact integer dcval shortcut
    ((dc + 1028) >> 3, clipped), so no float ever reaches a
    closed-form-gated pixel."""
    nby, nbx, _ = deq.shape
    flat = deq.reshape(nby * nbx, 64)
    f = flat.reshape(nby * nbx, 8, 8).astype(np.float64)
    pix = _IDCT_M.T @ f @ _IDCT_M
    out = np.floor(pix + 128.0 + 0.5)
    out = np.clip(out, 0.0, 255.0).astype(np.int64)
    dc_only = ~np.any(flat[:, 1:], axis=1)
    if dc_only.any():
        val = (flat[dc_only, 0] + 1028) >> 3
        np.clip(val, 0, 255, out=val)
        out[dc_only] = val[:, None, None]
    return (
        out.reshape(nby, nbx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(nby * 8, nbx * 8)
    )


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline OR progressive JPEG → (width, height,
    n_channels, pixels).

    Pixels are row-major bytes: 1 byte/pixel for grayscale, RGB
    interleaved for 3-component images (JFIF YCbCr→RGB with the fixed
    operand order documented in the module header). Partial MCUs at
    the right/bottom edges are decoded in full and cropped.
    Progressive streams (SOF2) accumulate raw coefficients across
    every scan, then dequantize + IDCT once — bit-identical to the
    baseline decode of the same quantized coefficients.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    progressive = False
    prog_coeffs: list[np.ndarray] | None = None
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            if progressive and prog_coeffs is not None:
                break  # all scans consumed — reconstruct below
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = seg[off + 1 : off + 65]
                if len(zz) < 64:
                    raise ValueError("truncated DQT segment")
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = zz[k]
                qtables[tq] = tbl
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = tuple(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = tuple(seg[off + 17 : off + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                htables[tc_th] = _decode_table(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if h == 0:
                raise NotImplementedError("DNL-deferred height")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "hv": (hv >> 4, hv & 0x0F), "tq": tq})
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported SOF marker 0xFF{marker:02X} (extended/"
                "lossless/hierarchical/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            pos += seglen
            if not progressive:
                break
            # progressive: Ss / Se / Ah|Al follow the component specs
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            w_, h_, comps_ = frame
            if prog_coeffs is None:
                hmax_ = max(c["hv"][0] for c in comps_)
                vmax_ = max(c["hv"][1] for c in comps_)
                mx_ = -(-w_ // (8 * hmax_))
                my_ = -(-h_ // (8 * vmax_))
                prog_coeffs = [
                    np.zeros((my_ * c["hv"][1], mx_ * c["hv"][0], 64),
                             dtype=np.int64)
                    for c in comps_
                ]
            pos = _decode_scan_prog(
                data, pos, w_, h_, comps_, prog_coeffs, scan,
                ss, se, ah, al, htables, restart_interval,
            )
            continue
        # APPn / COM / anything else with a length: skip
        pos += seglen

    w, h, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    hmax = max(c["hv"][0] for c in comps)
    vmax = max(c["hv"][1] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        ch, cv = c["hv"]
        planes.append(
            np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.int64)
        )

    if progressive:
        # all scans already accumulated raw coefficients; dequantize
        # and IDCT once — exactly what a baseline decode of the same
        # coefficients computes
        for ci, c in enumerate(comps):
            q = np.array(qtables[c["tq"]], dtype=np.int64)
            planes[ci] = _idct_plane(prog_coeffs[ci] * q)
        return _finish_pixels(w, h, comps, planes, hmax, vmax)

    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) baseline")
    scan_by_id = {s[0]: s for s in scan}

    # entropy-decode dequantized coefficients into per-component grids,
    # then IDCT every block in one vectorized pass (round-13, guide
    # §4.2 — was a per-block `_idct_block` call interleaved with the
    # bit reading; the coefficient values and their block positions are
    # unchanged, so the pixels are bit-identical)
    base_coeffs = [
        np.zeros(
            (mcuy * c["hv"][1], mcux * c["hv"][0], 64), dtype=np.int64
        )
        for c in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    m = 0
    while m < n_mcu:
        try:
            if restart_interval and m and m % restart_interval == 0:
                br.byte_align()
                # the next marker must be RSTn — either already seen
                # by the reader or next in the raw stream
                if br.marker is None:
                    if data[br.pos] != 0xFF:
                        raise ValueError("expected RST marker")
                    br.marker = data[br.pos + 1]
                    br.pos += 2
                if not 0xD0 <= br.marker <= 0xD7:
                    raise ValueError(
                        f"expected RST, got 0xFF{br.marker:02X}"
                    )
                br.marker = None
                preds = [0] * len(comps)
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(comps):
                ch, cv = c["hv"]
                q = qtables[c["tq"]]
                _, td, ta = scan_by_id[c["id"]]
                dct = htables[td]
                act = htables[0x10 | ta]
                for by in range(cv):
                    for bx in range(ch):
                        size = _decode_huffman(br, dct)
                        diff = _extend(br.read_bits(size), size)
                        preds[ci] += diff
                        coeffs = base_coeffs[ci][my * cv + by, mx * ch + bx]
                        coeffs[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(br, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            v = _extend(br.read_bits(s), s)
                            coeffs[ZIGZAG[k]] = v * q[ZIGZAG[k]]
                            k += 1
            m += 1
        except _MarkerHit:
            raise ValueError(
                f"marker 0xFF{br.marker:02X} interrupted entropy data"
            ) from None

    for ci in range(len(comps)):
        planes[ci] = _idct_plane(base_coeffs[ci])
    return _finish_pixels(w, h, comps, planes, hmax, vmax)


def _finish_pixels(
    w: int, h: int, comps: list[dict], planes: list, hmax: int, vmax: int
) -> tuple[int, int, int, bytes]:
    """Shared decode tail: crop, upsample chroma by replication to the
    luma grid, JFIF YCbCr→RGB in the pinned operand order."""
    if len(comps) == 1:
        return w, h, 1, planes[0][:h, :w].astype(np.uint8).tobytes()

    full = []
    for ci, c in enumerate(comps):
        ch, cv = c["hv"]
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w].astype(np.float64))
    y, cb, cr = full
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(
        np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5),
        0,
        255,
    )
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = r
    out[:, :, 1] = g
    out[:, :, 2] = b
    return w, h, 3, out.tobytes()


def quantize_dc(value: int, q: int) -> int:
    """The flat-block generators' quantizer: round-half-away-from-zero
    of 8·(value−128)/q in exact integer arithmetic — replayable in SQL
    as a CASE over the sign."""
    c = 8 * (value - 128)
    if c >= 0:
        return (c + q // 2) // q
    return -((-c + q // 2) // q)


def flat_block(value: int, q: int) -> list[int]:
    """64 quantized coefficients for a flat 8×8 block of ``value``."""
    return [quantize_dc(value, q)] + [0] * 63


def decoded_flat(value: int, q: int) -> int:
    """The exact decoded pixel value of a flat block — the closed form
    the SQL oracles replay: (q·quantize_dc + 1028) >> 3."""
    return (q * quantize_dc(value, q) + 1028) >> 3


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2, T.81 Annex G) — round 12, VERDICT r11 item 3
# ---------------------------------------------------------------------------


def build_huffman_spec(
    freq: dict[int, int],
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Optimal length-limited Huffman spec (BITS[1..16], HUFFVAL) from
    symbol frequencies — the T.81 Annex K.2 procedure: CODE_SIZE via
    chained lowest-frequency merges (ties broken toward the LARGER
    symbol value), COUNT_BITS, ADJUST_BI folding lengths >16 down, and
    the reserved pseudo-symbol 256 guaranteeing no real code is
    all-ones. Needed because progressive scans emit EOBn symbols
    (r<<4 for r=1..14) that the standard Annex K tables do not carry.
    """
    f = [0] * 257
    for s, c in freq.items():
        if not 0 <= s <= 255:
            raise ValueError(f"symbol {s} out of range")
        f[s] = c
    f[256] = 1  # reserved: soaks up the all-ones code
    codesize = [0] * 257
    others = [-1] * 257
    # Heap-based K.2 merge (round-12 optimization — the linear scans
    # rescanned all 257 slots twice per merge, ~30k iterations per
    # table and a table is built per scan per image). The heap orders
    # by (freq, -symbol), which IS the spec's selection rule — least
    # frequency, ties to the LARGER symbol value — so the merge
    # sequence, code sizes and therefore the emitted BYTES are
    # identical to the linear form. Stale entries (freq changed by a
    # later merge, or zeroed as a v2) are lazily skipped.
    import heapq

    heap = [(f[i], -i, i) for i in range(257) if f[i] > 0]
    heapq.heapify(heap)
    while True:
        v1 = v2 = -1
        while heap:
            fr, _, i = heapq.heappop(heap)
            if f[i] == fr:
                v1 = i
                break
        while heap:
            fr, _, i = heap[0]
            if f[i] != fr or f[i] == 0:
                heapq.heappop(heap)
                continue
            v2 = i
            break
        if v2 < 0:
            break
        f[v1] += f[v2]
        f[v2] = 0
        heapq.heappush(heap, (f[v1], -v1, v1))
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32  # ADJUST_BI (K.2 figure K.3)
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16  # drop the reserved symbol's slot from the longest length
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1
    # sort only the symbols that actually received codes (same
    # (codesize, symbol) order as sorting the full 0..255 range)
    huffval = tuple(
        s for _, s in sorted(
            (codesize[s], s) for s in range(256) if codesize[s] > 0
        )
    )
    return tuple(bits[1:17]), huffval


class _CountEmitter:
    """First-pass scan walk: collects Huffman symbol frequencies."""

    def __init__(self) -> None:
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass

    def restart(self) -> None:
        pass


class _RecordEmitter:
    """Single scan walk that counts Huffman symbol frequencies AND
    records the emission stream, so the entropy pass is a replay of
    the recorded ops instead of a second traversal of every data unit
    (round-13, guide §4.2 — the two-pass walk re-ran the zero-run /
    significance scans over all 63 band positions of every block
    twice; replaying emits the identical (sym, bits, restart) sequence
    in the identical order, so payloads stay byte-identical)."""

    __slots__ = ("freq", "ops")

    def __init__(self) -> None:
        self.freq: dict[int, int] = {}
        # op encoding: n >= 0 -> bits(v, n); n == -1 -> sym(v);
        # n == -2 -> restart()
        self.ops: list[tuple[int, int]] = []

    def sym(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1
        self.ops.append((s, -1))

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append((v, n))

    def restart(self) -> None:
        self.ops.append((0, -2))

    def replay(self, em: "_WriteEmitter") -> None:
        bw = em.bw
        codes = em.codes
        write = bw.write
        for v, n in self.ops:
            if n >= 0:
                write(v, n)
            elif n == -1:
                code, length = codes[v]
                write(code, length)
            else:
                em.restart()


class _WriteEmitter:
    """Second-pass scan walk: writes codes + raw bits + RST markers."""

    def __init__(self, bw: _BitWriter, codes) -> None:
        self.bw = bw
        self.codes = codes
        self.rst = 0

    def sym(self, s: int) -> None:
        code, length = self.codes[s]
        self.bw.write(code, length)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)

    def restart(self) -> None:
        self.bw.byte_align()
        self.bw.out += b"\xff" + bytes([0xD0 + self.rst])
        self.rst = (self.rst + 1) % 8


def _scan_units(
    w: int, h: int, comps: list[dict], idxs: list[int]
) -> list[list[tuple[int, int, int]]]:
    """Data-unit sequence for one scan: a list of restart units, each
    a list of (comp_index, by, bx) blocks. Interleaved scans (>1
    component) walk MCUs; single-component scans walk the component's
    OWN block grid in raster order (T.81 A.2.2 — non-interleaved
    dimensions are ceil of the scaled component size, not the padded
    MCU grid)."""
    hmax = max(c["hv"][0] for c in comps)
    vmax = max(c["hv"][1] for c in comps)
    if len(idxs) > 1:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        units = []
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            blocks = []
            for ci in idxs:
                ch, cv = comps[ci]["hv"]
                for by in range(cv):
                    for bx in range(ch):
                        blocks.append((ci, my * cv + by, mx * ch + bx))
            units.append(blocks)
        return units
    ci = idxs[0]
    ch, cv = comps[ci]["hv"]
    cw = -(-(w * ch) // hmax)
    chh = -(-(h * cv) // vmax)
    nbx = -(-cw // 8)
    nby = -(-chh // 8)
    return [[(ci, by, bx)] for by in range(nby) for bx in range(nbx)]


def _decode_scan_prog(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    comps: list[dict],
    coeffs: list[np.ndarray],
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    htables: dict[int, dict[tuple[int, int], int]],
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the raw-coefficient arrays;
    returns the stream position of the next marker. Implements the
    four T.81 Annex G scan kinds: DC first (diffs of the
    arithmetic-shifted value), DC refine (one bit ORed at Al), AC
    first (run/size with EOBn run coding, values shifted by Al), AC
    refine (±1 significance codes + correction bits, sign-magnitude)
    — the jdphuff.c control flow, re-derived from the spec."""
    ids = {c["id"]: i for i, c in enumerate(comps)}
    idxs = [ids[cs] for cs, _, _ in scan]
    tds = {ids[cs]: td for cs, td, _ in scan}
    tas = {ids[cs]: ta for cs, _, ta in scan}
    if ss == 0 and se != 0:
        raise ValueError(
            "progressive scan cannot mix DC and AC (Ss=0 requires Se=0"
            " — T.81 G.1.1.1.1)"
        )
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not 0 <= ss <= se <= 63 or ah > 13 or al > 13:
        raise ValueError(f"bad scan header Ss={ss} Se={se} Ah={ah} Al={al}")
    units = _scan_units(w, h, comps, idxs)
    br = _BitReader(data, pos)
    preds = {ci: 0 for ci in idxs}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    try:
        for u, blocks in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                br.byte_align()
                if br.marker is None:
                    if data[br.pos] != 0xFF:
                        raise ValueError("expected RST marker")
                    br.marker = data[br.pos + 1]
                    br.pos += 2
                if not 0xD0 <= br.marker <= 0xD7:
                    raise ValueError(f"expected RST, got 0xFF{br.marker:02X}")
                br.marker = None
                preds = {ci: 0 for ci in idxs}
                eobrun = 0
            for ci, by, bx in blocks:
                blk = coeffs[ci][by, bx]
                if ss == 0:
                    if ah == 0:  # DC first
                        size = _decode_huffman(br, htables[tds[ci]])
                        diff = _extend(br.read_bits(size), size)
                        preds[ci] += diff
                        blk[0] = preds[ci] << al
                    else:  # DC refine: one bit ORed at position Al
                        if br.read_bit():
                            blk[0] = int(blk[0]) | p1
                    continue
                act = htables[0x10 | tas[ci]]
                if ah == 0:  # AC first
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huffman(br, act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC run past band end")
                        blk[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
                        k += 1
                else:  # AC refine
                    k = ss
                    # one tolist per block: the refinement loops index
                    # the 64-vector per coefficient, and Python-int
                    # list access is ~3x a numpy scalar read (the
                    # png_codec _unfilter_scanline measurement); the
                    # arithmetic is identical on plain ints
                    bl = blk.tolist()
                    if eobrun == 0:
                        while k <= se:
                            rs = _decode_huffman(br, act)
                            r, s = rs >> 4, rs & 0x0F
                            newval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                                # r == 15: run of 16 zero-history coeffs
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "AC refinement size must be 1"
                                    )
                                newval = p1 if br.read_bit() else m1
                            while k <= se:
                                zi = ZIGZAG[k]
                                c = bl[zi]
                                if c != 0:
                                    if br.read_bit() and (c & p1) == 0:
                                        bl[zi] = c + (p1 if c >= 0 else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k <= se:
                                bl[ZIGZAG[k]] = newval
                            k += 1
                    if eobrun > 0:
                        # refine the band's tail: ONE batched read of
                        # the correction bits — one bit per nonzero-
                        # history coefficient, consumed in the same
                        # MSB-first order as the per-bit loop
                        # (round-13, guide §4.2)
                        nz = [
                            ZIGZAG[kk]
                            for kk in range(k, se + 1)
                            if bl[ZIGZAG[kk]] != 0
                        ]
                        if nz:
                            got = br.read_bits(len(nz))
                            shift = len(nz)
                            for zi in nz:
                                shift -= 1
                                c = bl[zi]
                                if (got >> shift) & 1 and (c & p1) == 0:
                                    bl[zi] = c + (p1 if c >= 0 else m1)
                        eobrun -= 1
                    blk[:] = bl
    except _MarkerHit:
        raise ValueError(
            f"marker 0xFF{br.marker:02X} interrupted progressive scan"
        ) from None
    return br.pos


def _enc_dc_first(em, units, coeffs, dc_codes_unused, al, ri) -> None:
    preds: dict[int, int] = {}
    for u, blocks in enumerate(units):
        if ri and u and u % ri == 0:
            em.restart()
            preds = {}
        for ci, by, bx in blocks:
            v = coeffs[ci][by][bx][0] >> al  # arithmetic shift (G.1.2.1)
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            size, extra = _magnitude_bits(diff)
            em.sym(size)
            em.bits(extra, size)


def _enc_dc_refine(em, units, coeffs, al, ri) -> None:
    for u, blocks in enumerate(units):
        if ri and u and u % ri == 0:
            em.restart()
        for ci, by, bx in blocks:
            em.bits((coeffs[ci][by][bx][0] >> al) & 1, 1)


def _band_events(coeffs, units, ss: int, se: int, al: int):
    """Per-scan vectorized precompute for the AC encoders (round-13,
    guide §4.2 — the per-position Python walk touched all se−ss+1 band
    slots of every block; real blocks carry a handful of significant
    coefficients, so iterating EVENTS only is a ~5x smaller loop).
    Returns (ev_block, ev_k, ev_mag, ev_pos, n): parallel Python lists
    of the band positions whose shifted magnitude |v|>>al is nonzero,
    in (block, k) raster order — exactly the positions at which the
    position-walk emitted or buffered anything; zero-gap lengths are
    reconstructed arithmetically by the callers."""
    ci = units[0][0][0]
    grid = np.asarray(coeffs[ci], dtype=np.int64)
    nby, nbx, _ = grid.shape
    vals = grid.reshape(nby * nbx, 64)[:, ZIGZAG[ss : se + 1]]
    mags = np.abs(vals) >> al
    nz_b, nz_k = np.nonzero(mags)
    ev_mag = mags[nz_b, nz_k].tolist()
    ev_pos = (vals[nz_b, nz_k] > 0).tolist()
    return nz_b.tolist(), nz_k.tolist(), ev_mag, ev_pos, len(ev_mag)


def _enc_ac_first(em, units, coeffs, ss, se, al, ri) -> None:
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            em.sym(n << 4)
            em.bits(eobrun - (1 << n), n)
            eobrun = 0

    ev_b, ev_k, ev_mag, ev_pos, nev = _band_events(coeffs, units, ss, se, al)
    p = 0
    for u, _blocks in enumerate(units):
        if ri and u and u % ri == 0:
            flush()
            em.restart()
        q = p
        while q < nev and ev_b[q] == u:
            q += 1
        prev = ss - 1
        for j in range(p, q):
            k = ss + ev_k[j]
            r = k - prev - 1
            prev = k
            flush()
            while r > 15:
                em.sym(0xF0)
                r -= 16
            t = ev_mag[j] if ev_pos[j] else -ev_mag[j]
            size, extra = _magnitude_bits(t)
            em.sym((r << 4) | size)
            em.bits(extra, size)
        p = q
        if prev < se:  # trailing (or all-)zero band tail → EOB run
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(em, units, coeffs, ss, se, al, ri) -> None:
    """TWO correction-bit buffers, exactly the jcphuff.c discipline
    (BE vs BR): ``held`` carries the bits of blocks already covered by
    the pending EOB run and is emitted WITH the EOBn symbol; ``cur``
    carries the current block's bits since its last emitted symbol and
    follows THAT symbol — the decoder reads held bits while replaying
    the run-covered blocks' bands and cur bits inside the current
    block's advance loop, so merging the buffers mis-frames the
    stream (the round-12 first-draft bug, caught by the multi-block
    equivalence test)."""
    eobrun = 0
    held: list[int] = []  # run-covered blocks' bits (jcphuff BE)

    def emit_bits(bits: list[int]) -> None:
        # batch a 0/1 list into ONE write call (round-12 — per-bit
        # em.bits(b, 1) calls were the scan's hottest line); MSB-first
        # packing reproduces the per-bit emission order exactly
        n = len(bits)
        if n:
            v = 0
            for b in bits:
                v = (v << 1) | b
            em.bits(v, n)

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(nb << 4)
            em.bits(eobrun - (1 << nb), nb)
            eobrun = 0
            emit_bits(held)
            held.clear()

    ev_b, ev_k, ev_mag, ev_pos, nev = _band_events(coeffs, units, ss, se, al)
    p = 0
    for u, _blocks in enumerate(units):
        if ri and u and u % ri == 0:
            flush_eob()
            em.restart()
        q = p
        while q < nev and ev_b[q] == u:
            q += 1
        eob_k = ss - 1  # last newly-significant index
        for j in range(p, q):
            if ev_mag[j] == 1:
                eob_k = ss + ev_k[j]
        r = 0
        prev = ss - 1
        cur: list[int] = []  # this block's bits since last symbol (BR)
        for j in range(p, q):
            k = ss + ev_k[j]
            t = ev_mag[j]
            r += k - prev - 1  # zero-history gap since the last event
            prev = k
            while r > 15 and k <= eob_k:
                flush_eob()
                em.sym(0xF0)
                r -= 16
                emit_bits(cur)
                cur = []
            if t > 1:  # history coefficient: buffer its correction bit
                cur.append(t & 1)
                continue
            flush_eob()
            em.sym((r << 4) | 1)
            em.bits(1 if ev_pos[j] else 0, 1)
            emit_bits(cur)
            cur = []
            r = 0
        r += se - prev  # trailing zero-history tail
        p = q
        if r > 0 or cur:
            eobrun += 1
            held.extend(cur)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def progressive_scan_script(
    ncomp: int,
    dc_al: int = 1,
    ac_al: int = 2,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> list[tuple[str, tuple[int, ...], int, int, int, int]]:
    """The default scan script: (kind, comp_indices, Ss, Se, Ah, Al).
    DC first (interleaved) at Al=dc_al, per-component AC band first
    scans at Al=ac_al, then DC/AC refinement passes down to Al=0."""
    allc = tuple(range(ncomp))
    scans: list[tuple[str, tuple[int, ...], int, int, int, int]] = [
        ("dc_first", allc, 0, 0, 0, dc_al)
    ]
    for ci in range(ncomp):
        for s0, s1 in bands:
            scans.append(("ac_first", (ci,), s0, s1, 0, ac_al))
    for al in range(dc_al - 1, -1, -1):
        scans.append(("dc_refine", allc, 0, 0, al + 1, al))
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for s0, s1 in bands:
                scans.append(("ac_refine", (ci,), s0, s1, al + 1, al))
    return scans


def encode_jpeg_progressive(
    width: int,
    height: int,
    components: list[dict],
    restart_interval: int = 0,
    scans=None,
) -> bytes:
    """Encode a progressive (SOF2) JFIF JPEG from QUANTIZED coefficient
    blocks — the same ``components`` contract as :func:`encode_jpeg`.
    Each scan is two-pass: a counting walk collects symbol
    frequencies, :func:`build_huffman_spec` derives an optimal table,
    a DHT overwrites slot 0 of the scan's class, then the entropy
    pass writes the bits. A complete default script (``scans=None``)
    reaches Al=0 everywhere, so decoding reproduces the baseline
    pixels of the same coefficients exactly."""
    ncomp = len(components)
    if ncomp not in (1, 3):
        raise ValueError(f"progressive encode supports 1 or 3, got {ncomp}")
    hmax = max(c["hv"][0] for c in components)
    vmax = max(c["hv"][1] for c in components)
    if width % (8 * hmax) or height % (8 * vmax):
        raise ValueError("dimensions must tile the MCU grid exactly")
    mcux, mcuy = width // (8 * hmax), height // (8 * vmax)
    for c in components:
        h, v = c["hv"]
        if len(c["coeffs"]) != mcuy * v or len(c["coeffs"][0]) != mcux * h:
            raise ValueError("coefficient grid does not match geometry")
    if scans is None:
        scans = progressive_scan_script(ncomp)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    for i, c in enumerate(components[:2]):
        zz = bytes(c["q"][ZIGZAG[k]] for k in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, i) + zz
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    )
    for i, c in enumerate(components):
        h, v = c["hv"]
        out += struct.pack(">BBB", i + 1, (h << 4) | v, min(i, 1))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    comp_meta = [{"hv": c["hv"]} for c in components]
    coeff_grids = [c["coeffs"] for c in components]

    def run(kind, em, units, ss, se, al):
        if kind == "dc_first":
            _enc_dc_first(em, units, coeff_grids, None, al, restart_interval)
        elif kind == "dc_refine":
            _enc_dc_refine(em, units, coeff_grids, al, restart_interval)
        elif kind == "ac_first":
            _enc_ac_first(em, units, coeff_grids, ss, se, al, restart_interval)
        else:
            _enc_ac_refine(
                em, units, coeff_grids, ss, se, al, restart_interval
            )

    for kind, idxs, ss, se, ah, al in scans:
        units = _scan_units(width, height, comp_meta, list(idxs))
        counter = _RecordEmitter()
        run(kind, counter, units, ss, se, al)
        if counter.freq:  # dc_refine scans carry no Huffman symbols
            bits, vals = build_huffman_spec(counter.freq)
            tc = 0 if kind == "dc_first" else 1
            out += b"\xff\xc4" + struct.pack(
                ">HB", 3 + 16 + len(vals), (tc << 4) | 0
            )
            out += bytes(bits) + bytes(vals)
            codes = _canonical_codes(bits, vals)
        else:
            codes = {}
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(idxs), len(idxs))
        for ci in idxs:
            out += struct.pack(">BB", ci + 1, 0)  # Td=0, Ta=0
        out += struct.pack(">BBB", ss, se, (ah << 4) | al)
        bw = _BitWriter()
        counter.replay(_WriteEmitter(bw, codes))
        bw.byte_align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
