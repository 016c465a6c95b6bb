"""Minimal dependency-free PDF emitter for the S6 report sink.

The reference renders each case to a PDF with reportlab
(/root/reference/src/render_pdf.py:324-471: title/fields block, then
the diagonal diagram's bars, separator lines, and category braces).
reportlab is not available in this container, so this module hand-rolls
the subset of PDF 1.4 needed to emit the draw-ops table produced by
``operators/diagram.py`` as a REAL, openable artifact:

  - single page per case, uncompressed content stream (inspectable by
    tests without a PDF library);
  - filled rectangles (``re``/``f``), stroked lines (``m``/``l``/``S``),
    and Helvetica text (``BT``/``Tj``/``ET``).

Known limitation, by environment: the base-14 Helvetica font is
Latin-1-only, so non-encodable characters (e.g. Japanese item text) are
replaced with ``?``. Full CJK parity needs an embedded font — a
data-file concern, not a pipeline one.

Coordinates arrive in the diagram layer's tenth-millimetre integers and
are scaled to PDF points (1 tenth-mm = 0.2834645 pt).
"""

from __future__ import annotations

TENTH_MM_TO_PT = 72.0 / 254.0  # 0.1 mm in points


def _rgb(hex_color: str) -> tuple[float, float, float]:
    h = (hex_color or "#000000").lstrip("#")
    return tuple(int(h[i : i + 2], 16) / 255.0 for i in (0, 2, 4))


def _pdf_text(s: str) -> bytes:
    """Latin-1 with PDF string escapes; non-encodable chars become '?'."""
    raw = (s or "").encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def content_stream(ops: list[dict], page_h_tmm: float) -> bytes:
    """Draw-op rows → one page's content stream. Rows must already be in
    draw order (section, seq). Supported ``op`` values: ``rect`` (+
    optional label), ``line``, ``text``."""
    s = TENTH_MM_TO_PT
    out: list[bytes] = []
    for r in ops:
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
                    b"BT /F1 9 Tf 0 0 0 rg %.2f %.2f Td (%s) Tj ET"
                    % (x + 2, y + h / 3, _pdf_text(r["label"]))
                )
        elif op == "line":
            out.append(
                b"0 0 0 RG 0.7 w %.2f %.2f m %.2f %.2f l S"
                % (r["x"] * s, r["y"] * s, r["x2"] * s, r["y2"] * s)
            )
        elif op == "text":
            out.append(
                b"BT /F1 10 Tf 0 0 0 rg %.2f %.2f Td (%s) Tj ET"
                % (r["x"] * s, r["y"] * s, _pdf_text(r.get("label") or ""))
            )
    return b"\n".join(out)


def minimal_pdf(ops: list[dict], page_w_tmm: float, page_h_tmm: float) -> bytes:
    """A complete single-page PDF 1.4 file from draw-op rows."""
    s = TENTH_MM_TO_PT
    stream = content_stream(ops, page_h_tmm)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %.2f %.2f] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        % (page_w_tmm * s, page_h_tmm * s),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
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
