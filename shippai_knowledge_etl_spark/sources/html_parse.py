"""HTML → tall label/value rows: the parse edge (SURVEY.md §2.9, S1/P2).

The reference walks ``<tr>`` rows with BeautifulSoup and keeps pairs
whose first ``<td>`` has bgcolor #DFE9F2 (src/extract.py:57-82). Here
the full-fidelity HTML→rows step is the ONE place Python touches raw
markup: an Arrow-batched pandas UDF (iterator form — parser state
reused across batches) built on stdlib ``html.parser`` (bs4/lxml are
not in this container). Everything downstream of the tall rows is pure
column expressions, so the UDF boundary is also the pushdown boundary
by design (SURVEY §4.2).

Per-row parse is embarrassingly parallel: one page = one row; at 100 TB
the UDF scales with executors and shuffles nothing.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from shippai_knowledge_etl_spark.schemas import PAGE_ROW_SCHEMA

# A real DataType, not a DDL string: string return types are re-parsed
# on the Python worker, where no SparkSession exists.
ROWS_TYPE = T.ArrayType(PAGE_ROW_SCHEMA)


class _TableRowParser(HTMLParser):
    """Collect (label_td, value_td) pairs per <tr>: first td = label
    (with its bgcolor), last td = value; hrefs anywhere in the row."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list[tuple[str, str, str, str | None]] = []
        self._in_tr = False
        self._tds: list[dict] = []
        self._href: str | None = None

    def handle_starttag(self, tag: str, attrs: list) -> None:
        a = dict(attrs)
        if tag == "tr":
            self._in_tr, self._tds, self._href = True, [], None
        elif tag == "td" and self._in_tr:
            self._tds.append({"bgcolor": a.get("bgcolor", ""), "text": []})
        elif tag == "a" and self._in_tr and self._href is None:
            self._href = a.get("href")
        elif tag == "br" and self._tds:
            self._tds[-1]["text"].append("\n")

    def handle_data(self, data: str) -> None:
        if self._in_tr and self._tds:
            self._tds[-1]["text"].append(data)

    def handle_endtag(self, tag: str) -> None:
        if tag == "tr" and self._in_tr:
            if len(self._tds) >= 2:
                first, last = self._tds[0], self._tds[-1]
                self.rows.append(
                    (
                        "".join(first["text"]).strip(),
                        "".join(last["text"]).strip(),
                        first["bgcolor"],
                        self._href,
                    )
                )
            self._in_tr = False


def parse_page(html: str) -> list[tuple[int, str, str, str, str | None]]:
    p = _TableRowParser()
    p.feed(html)
    return [
        (i, label, value, bgcolor, href)
        for i, (label, value, bgcolor, href) in enumerate(p.rows)
    ]


@pandas_udf(ROWS_TYPE)
def html_to_rows(pages: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in pages:
        yield pd.Series([parse_page(h) if h else [] for h in batch])


LINK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("pos", T.IntegerType()),
        T.StructField("href", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)
LINKS_TYPE = T.ArrayType(LINK_ROW_SCHEMA)


class _AnchorListParser(HTMLParser):
    """S2: anchors inside ``<ul class="list_all">`` in document order —
    the reference's list-page walk (src/extract.py:396-407). Anchors in
    other lists (or outside any list) are ignored, nested uls inside the
    target list are included, and the class attribute may contain
    multiple names."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[int, str, str]] = []
        self._depth = 0  # >0 while inside a list_all ul
        self._href: str | None = None
        self._text: list[str] = []

    def handle_starttag(self, tag: str, attrs: list) -> None:
        a = dict(attrs)
        if tag == "ul":
            if self._depth > 0 or "list_all" in (a.get("class") or "").split():
                self._depth += 1
        elif tag == "a" and self._depth > 0:
            self._href, self._text = a.get("href"), []

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._text.append(data)

    def handle_endtag(self, tag: str) -> None:
        if tag == "ul" and self._depth > 0:
            self._depth -= 1
        elif tag == "a" and self._href is not None:
            self.links.append(
                (len(self.links), self._href, "".join(self._text).strip())
            )
            self._href = None

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        # a self-closing tag opens AND closes: without the end-tag half,
        # '<ul class="list_all"/>' would leak _depth for the rest of the
        # document and '<a ... />' would leave _href dangling
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)


def parse_list_page(html: str) -> list[tuple[int, str, str]]:
    p = _AnchorListParser()
    p.feed(html)
    return p.links


@pandas_udf(LINKS_TYPE)
def list_page_links(pages: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in pages:
        yield pd.Series([parse_list_page(h) if h else [] for h in batch])


def label_rows(html_col: Column) -> Column:
    """Page HTML → exploded-ready tall rows, pre-filtered on the label
    bgcolor sentinel like the reference's in-scan predicate
    (src/extract.py:69-71): the filter runs right after parse, before
    anything shuffles."""
    return F.filter(
        html_to_rows(html_col),
        lambda r: F.upper(r.getField("bgcolor")) == "#DFE9F2",
    )
