"""Fast HTML event scanner ≡ stdlib HTMLParser (sources/html_parse).

The scanner replaces HTMLParser's goahead machinery on the strict
common subset and bails to the real parser otherwise; these tests pin
the equivalence claim with (a) a deterministic fuzz battery comparing
event streams on everything the scanner accepts and (b) end-to-end
parse_* output identity against a pure-HTMLParser reference on
representative page shapes, including every bail trigger.
"""

from __future__ import annotations

import random
from html.parser import HTMLParser

from shippai_knowledge_etl_spark.sources.html_parse import (
    _AnchorListParser,
    _BlockParser,
    _CasePageParser,
    _ScenarioPageParser,
    _TableRowParser,
    feed_fast,
)


class _Recorder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.ev: list = []

    def handle_starttag(self, t, a):
        self.ev.append(("s", t, a))

    def handle_endtag(self, t):
        self.ev.append(("e", t))

    def handle_startendtag(self, t, a):
        self.ev.append(("se", t, a))

    def handle_data(self, d):
        self.ev.append(("d", d))


def _norm(evs: list) -> list:
    """Merge adjacent data events: HTMLParser may emit a text run in
    several handle_data calls where the scanner emits one (and vice
    versa at charref boundaries) — the concatenation is the contract."""
    out: list = []
    for e in evs:
        if e[0] == "d" and out and out[-1][0] == "d":
            out[-1] = ("d", out[-1][1] + e[1])
        else:
            out.append(e)
    return out


_FRAGMENTS = [
    "<tr>", "</tr>", '<td bgcolor="#DFE9F2">', "<td>", "</td>",
    '<a href="/mf/x.jpg">', "</a>", "<br>", "<br/>",
    "<img src=a.gif width=120>", '<ul class="list_all">', "</ul>",
    "<b>1.</b>", "</b>", "<table>", "</table>",
    "&amp;", "&#x3042;", "text ", "漢字テキスト", " \n ",
    '<td a="b>c">', "<!-- comment -->", "<!DOCTYPE html>",
    "<input disabled>", "&amp", "tail&", "<TD BGCOLOR=#dfe9f2>",
    "< x", "</TD >", "<a href='../cf/CA1.html' target=_blank>",
    "<img src=\"space.gif\" width=\"120\">", "<script>x<y</script>",
]


def test_fuzz_event_stream_matches_htmlparser():
    rng = random.Random(13)
    for _ in range(3000):
        doc = "".join(
            rng.choice(_FRAGMENTS) for _ in range(rng.randrange(1, 30))
        )
        fast = _Recorder()
        feed_fast(fast, doc)
        ref = _Recorder()
        ref.feed(doc)
        assert _norm(fast.ev) == _norm(ref.ev), repr(doc)


def test_parse_outputs_identical_on_page_shapes():
    """End-to-end: each handler class produces identical state whether
    fed through the scanner or plain HTMLParser, on case/list/scenario/
    block page shapes plus bail triggers."""
    pages = [
        # run_pipeline_e2e's synthetic case page (both parities)
        '<table><tr><td bgcolor="#DFE9F2">事例名称</td><td>1-URGENT</td>'
        '</tr><tr><td bgcolor="#FFFFFF">無視</td><td>skipped</td></tr>'
        '<tr><td bgcolor="#dfe9f2">事例概要</td>'
        '<td><a href="/mf/m3.jpg">img</a>O</td></tr></table>',
        '<table><tr><td bgcolor="#DFE9F2">事例名称</td><td>x</td></tr>'
        "</table>",
        # list page with decoy + nested ul + self-closing noise
        '<ul class="other"><li><a href="/cf/DECOY.html">d</a></li></ul>'
        '<ul class="list_all"><li><a href="../cf/CA1.html">c1</a></li>'
        '<ul><li><a href="../cf/CA2.html">c2</a></li></ul></ul><hr/>',
        # scenario page with main cell, items, separators
        '<table><tr><td valign="top" width="60%"><table>'
        "<tr><td><b>1.</b></td><td></td><td>cause A</td></tr>"
        '<tr><td><img src="sinario_line_2.gif"></td>'
        '<td><img src="space.gif" width="240"></td></tr>'
        "<tr><td><b>2.</b></td><td></td><td>action B</td></tr>"
        "</table></td></tr></table>",
        # entity-bearing and malformed (bail) pages
        "<tr><td bgcolor=#DFE9F2>A &amp; B</td><td>v&lt;1</td></tr>",
        "<!-- c --><table><tr><td>x</td><td>y</td></tr></table>",
        "<table><tr><td a=\"b>c\">x</td><td>y</td></tr></table>",
        "prefix< loose <tr><td>x</td><td>y</td></tr>",
        "trailing text&",
        "",
    ]
    makers = [
        (_TableRowParser, lambda p: p.rows),
        (_AnchorListParser, lambda p: p.links),
        (
            _CasePageParser,
            lambda p: (p.rows, p.mm_label_links, p.mf_links,
                       p.rep_image_src, p.scenario_row_href, p.sf_href),
        ),
        (
            _ScenarioPageParser,
            lambda p: (p.main, p.all, p.saw_main),
        ),
        (_BlockParser, lambda p: p.blocks),
    ]
    for html in pages:
        for cls, state in makers:
            fast = cls()
            feed_fast(fast, html)
            ref = cls()
            ref.feed(html)
            assert state(fast) == state(ref), (cls.__name__, html)
