"""Minimal dependency-free PDF emitter for the S6 report sink.

The reference renders each case to a PDF with reportlab
(/root/reference/src/render_pdf.py:324-471: title/fields block, images,
then the diagonal diagram's bars, separator lines, and category
braces). reportlab is not available in this container, so this module
hand-rolls the subset of PDF 1.4 needed to emit the draw-ops table
produced by ``operators/diagram.py`` as a REAL, openable artifact:

  - single page per case, uncompressed content stream (inspectable by
    tests without a PDF library);
  - filled rectangles (``re``/``f``), stroked lines (``m``/``l``/``S``),
    text, and JPEG images (raw DCTDecode XObjects — a JPEG file body
    IS a valid PDF image stream, no decode needed);
  - CJK text via the SAME mechanism the reference uses
    (src/render_pdf.py:23-24 ``UnicodeCIDFont('HeiseiKakuGo-W5')``,
    requirements.md:179): a Type0 / CIDFontType0 font referencing the
    Adobe-Japan1 registry with the predefined ``UniJIS-UCS2-H`` CMap
    and NO embedded font file — the viewer supplies the glyphs, which
    is exactly what reportlab's UnicodeCIDFont emits. Strings
    containing non-Latin-1 characters are written as UTF-16BE hex
    strings under this font; pure Latin-1 text stays on base-14
    Helvetica.

Coordinates arrive in the diagram layer's tenth-millimetre integers and
are scaled to PDF points (1 tenth-mm = 0.2834645 pt).
"""

from __future__ import annotations

import struct

TENTH_MM_TO_PT = 72.0 / 254.0  # 0.1 mm in points

# the reference's Gothic CID font (src/render_pdf.py:24); Adobe-Japan1
# registry fonts are viewer-supplied, never embedded
CJK_BASE_FONT = b"HeiseiKakuGo-W5"
CJK_ENCODING = b"UniJIS-UCS2-H"


def _rgb(hex_color: str) -> tuple[float, float, float]:
    h = (hex_color or "#000000").lstrip("#")
    return tuple(int(h[i : i + 2], 16) / 255.0 for i in (0, 2, 4))


def _pdf_text_latin(s: str) -> bytes:
    """Latin-1 with PDF string escapes."""
    raw = (s or "").encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _is_latin1(s: str) -> bool:
    try:
        (s or "").encode("latin-1")
        return True
    except UnicodeEncodeError:
        return False


def _text_show(s: str, size: int) -> bytes:
    """A ``Tf``+show fragment choosing Helvetica for Latin-1 text and
    the CJK CID font (UTF-16BE hex string) otherwise."""
    if _is_latin1(s):
        return b"/F1 %d Tf (%s) Tj" % (size, _pdf_text_latin(s))
    utf16 = (s or "").encode("utf-16-be", errors="replace")
    return b"/F2 %d Tf <%s> Tj" % (size, utf16.hex().encode("ascii"))


def jpeg_dimensions(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, components) from a JPEG's SOF marker, or None if
    the bytes are not a parseable JPEG. Pure byte scan, no libraries."""
    if not data or data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        # SOF0-3, SOF5-7, SOF9-11, SOF13-15 all carry dimensions
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            comps = data[i + 9]
            return w, h, comps
        i += 2 + seg_len
    return None


def content_stream(ops: list[dict], image_names: dict[int, bytes]) -> bytes:
    """Draw-op rows → one page's content stream. Rows must already be in
    draw order (section, seq). Supported ``op`` values: ``rect`` (+
    optional label), ``line``, ``text``, ``image`` (op index must be in
    ``image_names``)."""
    s = TENTH_MM_TO_PT
    out: list[bytes] = []
    for idx, r in enumerate(ops):
        op = r["op"]
        if op == "rect":
            rr, gg, bb = _rgb(r.get("fill") or "#ffffff")
            x, y = r["x"] * s, r["y"] * s
            w, h = r["w"] * s, r["h"] * s
            out.append(
                b"%.3f %.3f %.3f rg %.2f %.2f %.2f %.2f re f"
                % (rr, gg, bb, x, y, w, h)
            )
            if r.get("label"):
                out.append(
                    b"BT 0 0 0 rg %.2f %.2f Td %s ET"
                    % (x + 2, y + h / 3, _text_show(r["label"], 9))
                )
        elif op == "line":
            out.append(
                b"0 0 0 RG 0.7 w %.2f %.2f m %.2f %.2f l S"
                % (r["x"] * s, r["y"] * s, r["x2"] * s, r["y2"] * s)
            )
        elif op == "text":
            out.append(
                b"BT 0 0 0 rg %.2f %.2f Td %s ET"
                % (r["x"] * s, r["y"] * s, _text_show(r.get("label") or "", 10))
            )
        elif op == "image" and idx in image_names:
            out.append(
                b"q %.2f 0 0 %.2f %.2f %.2f cm /%s Do Q"
                % (r["w"] * s, r["h"] * s, r["x"] * s, r["y"] * s,
                   image_names[idx])
            )
    return b"\n".join(out)


_COLOR_SPACES = {1: b"/DeviceGray", 3: b"/DeviceRGB", 4: b"/DeviceCMYK"}

# shared object ids: 1 Catalog, 2 Pages, 3 F1 Helvetica, 4 F2 Type0 CJK,
# 5 descendant CIDFont, 6 FontDescriptor; page objects follow
_FIRST_PAGE_OBJ = 7

_FONT_OBJS = [
    b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    b"<< /Type /Font /Subtype /Type0 /BaseFont /%s-%s "
    b"/Encoding /%s /DescendantFonts [5 0 R] >>"
    % (CJK_BASE_FONT, CJK_ENCODING, CJK_ENCODING),
    b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /%s "
    b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
    b"/Supplement 2 >> /FontDescriptor 6 0 R /DW 1000 >>" % CJK_BASE_FONT,
    b"<< /Type /FontDescriptor /FontName /%s /Flags 4 "
    b"/FontBBox [-92 -250 1010 922] /ItalicAngle 0 /Ascent 752 "
    b"/Descent -221 /CapHeight 737 /StemV 114 >>" % CJK_BASE_FONT,
]


def _resolve_images(ops: list[dict]) -> tuple[list[dict], list[tuple[int, bytes]]]:
    """Split image ops into XObject bodies (parseable JPEGs, with the
    op rewritten to the fitted draw box) and the reference's failure
    placeholder (``[画像読み込みエラー: caption]``,
    src/render_pdf.py:116-118) otherwise. The target (w, h) of an image
    op is a MAX box: the image scales to fit it preserving aspect ratio
    (src/render_pdf.py:103-110)."""
    image_objs: list[tuple[int, bytes]] = []
    resolved: list[dict] = []
    for r in ops:
        if r.get("op") != "image":
            resolved.append(r)
            continue
        dims = jpeg_dimensions(r.get("img") or b"")
        if dims is None:
            resolved.append(
                {
                    "op": "text",
                    "x": r["x"],
                    "y": r["y"],
                    "label": f"[画像読み込みエラー: {r.get('label') or ''}]",
                }
            )
            continue
        w_px, h_px, comps = dims
        ratio = min(r["w"] / w_px, r["h"] / h_px)
        fitted = dict(r, w=w_px * ratio, h=h_px * ratio)
        body = (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace %s /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length %d >>\nstream\n%s\nendstream"
            % (w_px, h_px, _COLOR_SPACES.get(comps, b"/DeviceRGB"),
               len(r["img"]), r["img"])
        )
        image_objs.append((len(resolved), body))
        resolved.append(fitted)
    return resolved, image_objs


def pdf_document(pages: list[dict]) -> bytes:
    """A complete multi-page PDF 1.4 file. Each page dict carries
    ``ops`` (draw-op rows, already in draw order), ``w`` and ``h``
    (page size, tenth-mm). Fonts are shared across pages; image
    XObjects are per-page."""
    s = TENTH_MM_TO_PT
    page_objects: list[bytes] = []  # bodies from _FIRST_PAGE_OBJ on
    kid_ids: list[int] = []
    next_id = _FIRST_PAGE_OBJ
    for page in pages:
        resolved, image_objs = _resolve_images(page["ops"])
        content_id = next_id
        page_id = next_id + 1
        first_img = next_id + 2
        image_names = {
            op_idx: b"Im%d" % i for i, (op_idx, _) in enumerate(image_objs)
        }
        stream = content_stream(resolved, image_names)
        xobj = b""
        if image_objs:
            entries = b" ".join(
                b"/Im%d %d 0 R" % (i, first_img + i)
                for i in range(len(image_objs))
            )
            xobj = b" /XObject << %s >>" % entries
        page_objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page_objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
            b"/Contents %d 0 R /Resources "
            b"<< /Font << /F1 3 0 R /F2 4 0 R >>%s >> >>"
            % (page["w"] * s, page["h"] * s, content_id, xobj)
        )
        page_objects.extend(body for _, body in image_objs)
        kid_ids.append(page_id)
        next_id += 2 + len(image_objs)

    kids = b" ".join(b"%d 0 R" % k for k in kid_ids)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(kid_ids)),
        *_FONT_OBJS,
        *page_objects,
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, 1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(buf)


def minimal_pdf(ops: list[dict], page_w_tmm: float, page_h_tmm: float) -> bytes:
    """Single-page convenience wrapper over :func:`pdf_document`."""
    return pdf_document([{"ops": ops, "w": page_w_tmm, "h": page_h_tmm}])
