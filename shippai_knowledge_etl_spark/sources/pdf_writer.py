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

import re
import struct

TENTH_MM_TO_PT = 72.0 / 254.0  # 0.1 mm in points

# paragraph typography (the reference's JP_Body is 10pt with reportlab's
# default 1.2 leading; we lead a little looser for the hand-rolled wrap)
PARA_SIZE = 10
LEAD_FACTOR = 1.4  # baseline-to-baseline, in em

# source lines render any URL as a live hyperlink, the reference's
# behavior (src/render_pdf.py:423-435: blue underlined <link href=...>)
_URL_RE = re.compile(r"https?://\S+")

# the reference's Gothic CID font (src/render_pdf.py:24); Adobe-Japan1
# registry fonts are viewer-supplied, never embedded
CJK_BASE_FONT = b"HeiseiKakuGo-W5"
CJK_ENCODING = b"UniJIS-UCS2-H"

# JP_H2 section-heading style (reference src/render_pdf.py:43-53):
# 13 pt #2c3e50 text on an #ecf0f1 background fill with 4 pt border
# padding, 20 pt leading, 16 pt space before / 6 pt after.
H2_SIZE = 13
H2_LEAD_PT = 20.0
H2_PAD_PT = 4.0
H2_BEFORE_PT = 16.0
H2_AFTER_PT = 6.0
H2_BG = "#ecf0f1"
H2_FG = "#2c3e50"


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


def para_budget(text: str, box_w_tmm: float, size: int = PARA_SIZE) -> tuple[int, float]:
    """(chars_per_line, advance_pt) for wrapping ``text`` into a box.
    Width math is EXACT for CJK: the CID font declares /DW 1000 and no
    /W array, so every glyph advances exactly ``size`` pt. Pure
    Latin-1 paragraphs render in proportional Helvetica, whose widest
    common glyphs stay under 0.6 em — the 0.6 em/char budget is a
    conservative bound, so Latin lines can only come out NARROWER than
    the box, never overflow it."""
    adv_pt = float(size) if not _is_latin1(text or "") else 0.6 * size
    return max(1, int((box_w_tmm * TENTH_MM_TO_PT) // adv_pt)), adv_pt


def wrap_para(
    text: str, box_w_tmm: float, size: int = PARA_SIZE
) -> list[tuple[str, list[tuple[int, int, str]]]]:
    """Greedy fixed-advance wrap: logical lines (``\\n``) chunked at
    the :func:`para_budget` budget. Returns one ``(line, link_spans)``
    tuple per rendered line, where link_spans are
    ``(start_col, end_col, url)`` for every ``https?://`` span —
    detected on the LOGICAL line and mapped through the chunking, so
    a URL broken across wrapped lines keeps per-line link geometry
    (reference: src/render_pdf.py:423-435).

    Re-wrap identity (load-bearing for the flow layout's page
    splitting): every emitted line is ≤ the budget of any text that
    contains it — a fragment's budget can only grow (a pure-Latin
    fragment of a CJK paragraph gets the wider Latin budget) — so
    wrapping a ``\\n``-rejoin of emitted lines reproduces them."""
    cpl, _ = para_budget(text or "", box_w_tmm, size)
    out: list[tuple[str, list[tuple[int, int, str]]]] = []
    for logical in (text or "").split("\n"):
        matches = [
            (m.start(), m.end(), m.group(0))
            for m in _URL_RE.finditer(logical)
        ]
        if logical == "":
            out.append(("", []))
            continue
        for i in range(0, len(logical), cpl):
            chunk = logical[i : i + cpl]
            spans = [
                (max(a, i) - i, min(b, i + len(chunk)) - i, u)
                for a, b, u in matches
                if max(a, i) < min(b, i + len(chunk))
            ]
            out.append((chunk, spans))
    return out or [("", [])]


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


def _para_fragments(
    r: dict, out: list[bytes], annots: list[tuple[float, float, float, float, str]]
) -> None:
    """Render one ``para`` op: wrapped lines top-down from ``y`` (the
    TOP of the block, tenth-mm), each URL span drawn blue + underlined
    with a matching /Annots /URI rect (reference styling,
    src/render_pdf.py:423-435). Under the uniform CID advance the
    segment x-offsets are exact; Latin segments use the conservative
    0.6 em advance so link rects can only be slightly wide."""
    s = TENTH_MM_TO_PT
    text = r.get("label") or ""
    box_w = r.get("w") or 1900.0
    size = PARA_SIZE
    _, adv = para_budget(text, box_w, size)
    lead = LEAD_FACTOR * size
    x0 = r["x"] * s
    for k, (line, spans) in enumerate(wrap_para(text, box_w, size)):
        base = r["y"] * s - size - k * lead
        if not spans:
            if line:
                out.append(
                    b"BT 0 0 0 rg %.2f %.2f Td %s ET"
                    % (x0, base, _text_show(line, size))
                )
            continue
        # segment walk: plain runs black, URL runs blue + underline
        cuts = sorted({0, len(line), *(c for a, b, _ in spans for c in (a, b))})
        link_at = {}
        for a, b, u in spans:
            for c in range(a, b):
                link_at[c] = u
        for a, b in zip(cuts, cuts[1:]):
            seg = line[a:b]
            if not seg:
                continue
            url = link_at.get(a)
            sx, ex = x0 + a * adv, x0 + b * adv
            color = b"0 0 1 rg" if url else b"0 0 0 rg"
            out.append(
                b"BT %s %.2f %.2f Td %s ET"
                % (color, sx, base, _text_show(seg, size))
            )
            if url:
                out.append(
                    b"0 0 1 RG 0.5 w %.2f %.2f m %.2f %.2f l S"
                    % (sx, base - 1.5, ex, base - 1.5)
                )
                annots.append((sx, base - 0.25 * size, ex, base + size, url))


def content_stream(
    ops: list[dict], image_names: dict[int, bytes]
) -> tuple[bytes, list[tuple[float, float, float, float, str]]]:
    """Draw-op rows → (one page's content stream, link-annotation
    rects). Rows must already be in draw order (section, seq).
    Supported ``op`` values: ``rect`` (+ optional label), ``line``,
    ``text``, ``para`` (wrapped block, URL spans hyperlinked),
    ``image`` (op index must be in ``image_names``)."""
    s = TENTH_MM_TO_PT
    out: list[bytes] = []
    annots: list[tuple[float, float, float, float, str]] = []
    for idx, r in enumerate(ops):
        op = r["op"]
        if op == "para":
            _para_fragments(r, out, annots)
        elif op == "rect":
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
        elif op == "h2":
            # JP_H2 section heading: background fill spanning the text
            # box (borderPadding around the 13 pt line), then the
            # heading text in #2c3e50. ``y`` is the text BASELINE,
            # like the text op.
            x, base = r["x"] * s, r["y"] * s
            w = (r.get("w") or 1900.0) * s
            br, bgg, bbb = _rgb(H2_BG)
            out.append(
                b"%.3f %.3f %.3f rg %.2f %.2f %.2f %.2f re f"
                % (
                    br, bgg, bbb,
                    x - H2_PAD_PT, base - H2_PAD_PT,
                    w + 2 * H2_PAD_PT, H2_SIZE + 2 * H2_PAD_PT,
                )
            )
            fr, fg, fb = _rgb(H2_FG)
            out.append(
                b"BT %.3f %.3f %.3f rg %.2f %.2f Td %s ET"
                % (fr, fg, fb, x, base,
                   _text_show(r.get("label") or "", H2_SIZE))
            )
        elif op == "image" and idx in image_names:
            out.append(
                b"q %.2f 0 0 %.2f %.2f %.2f cm /%s Do Q"
                % (r["w"] * s, r["h"] * s, r["x"] * s, r["y"] * s,
                   image_names[idx])
            )
    return b"\n".join(out), annots


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


def flow_pages(
    ops: list[dict],
    page_w_tmm: float,
    page_h_tmm: float,
    margin_tmm: float = 150.0,
    size: int = PARA_SIZE,
) -> list[dict]:
    """The reportlab ``doc.build(elements)`` analog: stack flow ops
    (``text`` headings, ``para`` blocks, ``image`` boxes) down the
    page by MEASURED height, breaking to a fresh page when the next
    line/box would cross the bottom margin — sections flow instead of
    being pinned to fixed pages (reference: Paragraph flowables +
    SimpleDocTemplate pagination, src/render_pdf.py:368-379,469).
    ``para`` blocks split ACROSS pages line-by-line: the placed
    fragment rejoins its fitting lines with ``\\n``, which re-wraps to
    itself (see :func:`wrap_para`'s re-wrap identity). Incoming ``y``
    values are ignored; ops keep their order. Returns page dicts for
    :func:`pdf_document`.

    Widow/orphan control (reference: platypus pagination,
    src/render_pdf.py:469): a multi-line paragraph never OPENS with a
    single line at the bottom of a page (orphan — the whole paragraph
    moves), and a split never strands the LAST line alone on the next
    page (widow — one extra line moves with it). ``h2`` section
    headings (JP_H2 style: space-before, 20 pt leading, background
    fill drawn by :func:`content_stream`) keep with their next line:
    a heading with no room for itself plus one body line breaks to
    the fresh page instead of dangling last."""
    lead_tmm = (LEAD_FACTOR * size) / TENTH_MM_TO_PT
    gap_tmm = 30.0
    top, bottom = page_h_tmm - margin_tmm, margin_tmm
    pages: list[dict] = []
    cur: list[dict] = []
    y = top

    def break_page() -> None:
        nonlocal cur, y
        pages.append({"ops": cur, "w": page_w_tmm, "h": page_h_tmm})
        cur, y = [], top

    prev_op = None
    for r in ops:
        op = r.get("op")
        # a heading/label line following body content starts a new
        # section — give it breathing room (reportlab Spacer analog)
        if op == "text" and prev_op in ("para", "image"):
            y -= gap_tmm
        if op == "para":
            box_w = r.get("w") or (page_w_tmm - 2 * margin_tmm)
            lines = [ln for ln, _ in wrap_para(r.get("label") or "", box_w, size)]
            i = 0
            while i < len(lines):
                remaining = len(lines) - i
                n_room = int((y - bottom) // lead_tmm)
                # orphan control: a multi-line block never opens with a
                # single line at the page bottom — break and start it
                # fresh (continuations land just after a break, where
                # the room is the full page, so this bites at i == 0)
                if cur and (n_room < 1 or (n_room == 1 and remaining > 1)):
                    break_page()
                    continue
                n_fit = max(1, min(n_room, remaining))
                # widow control: never strand the LAST line alone on
                # the next page — hold one line back to accompany it
                if remaining > n_fit and remaining - n_fit == 1 and n_fit > 1:
                    n_fit -= 1
                chunk = lines[i : i + n_fit]
                cur.append(dict(r, y=y, w=box_w, label="\n".join(chunk)))
                y -= len(chunk) * lead_tmm
                i += n_fit
        elif op == "h2":
            h2_lead = H2_LEAD_PT / TENTH_MM_TO_PT
            if prev_op is not None:
                y -= H2_BEFORE_PT / TENTH_MM_TO_PT
            # keep-with-next: the heading needs room for itself AND
            # one body line, or it dangles last on the page
            if y - (h2_lead + lead_tmm) < bottom and cur:
                break_page()
            box_w = r.get("w") or (page_w_tmm - 2 * margin_tmm)
            cur.append(dict(r, y=y - h2_lead, w=box_w))
            y -= h2_lead + H2_AFTER_PT / TENTH_MM_TO_PT
        elif op == "image":
            box_h = r.get("h") or 0.0
            if y - box_h < bottom and cur:
                break_page()
            # image ops anchor at their BOTTOM-left (PDF cm semantics);
            # the fitted draw (aspect-preserving, _resolve_images) is
            # never taller than the reserved box
            cur.append(dict(r, y=max(y - box_h, bottom)))
            y -= box_h + gap_tmm
        else:  # single-line text / rect / line
            if y - lead_tmm < bottom and cur:
                break_page()
            cur.append(dict(r, y=y - lead_tmm))
            y -= lead_tmm
        prev_op = op
    if cur:
        pages.append({"ops": cur, "w": page_w_tmm, "h": page_h_tmm})
    return pages


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
        stream, annots = content_stream(resolved, image_names)
        xobj = b""
        if image_objs:
            entries = b" ".join(
                b"/Im%d %d 0 R" % (i, first_img + i)
                for i in range(len(image_objs))
            )
            xobj = b" /XObject << %s >>" % entries
        first_annot = first_img + len(image_objs)
        annot_objs = [
            b"<< /Type /Annot /Subtype /Link /Rect [%.2f %.2f %.2f %.2f] "
            b"/Border [0 0 0] /A << /S /URI /URI (%s) >> >>"
            % (x0, y0, x1, y1, _pdf_text_latin(url))
            for x0, y0, x1, y1, url in annots
        ]
        annot_ref = b""
        if annot_objs:
            refs = b" ".join(
                b"%d 0 R" % (first_annot + i) for i in range(len(annot_objs))
            )
            annot_ref = b" /Annots [%s]" % refs
        page_objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page_objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
            b"/Contents %d 0 R /Resources "
            b"<< /Font << /F1 3 0 R /F2 4 0 R >>%s >>%s >>"
            % (page["w"] * s, page["h"] * s, content_id, xobj, annot_ref)
        )
        page_objects.extend(body for _, body in image_objs)
        page_objects.extend(annot_objs)
        kid_ids.append(page_id)
        next_id += 2 + len(image_objs) + len(annot_objs)

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
