"""Fetch-edge tests against a loopback HTTP server — real sockets, no
external network (SURVEY §7.4 item 6: live fetch is smoke-only)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path.startswith("/cf/"):
            body = f"<html><body>case {self.path}</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)
        elif self.path.startswith("/img/"):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"\x89PNGfake" + self.path.encode())
        else:
            self.send_error(404)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_html_ok_and_404(spark, http_base):
    from shippai_knowledge_etl_spark.sources.fetch import fetch_html

    df = spark.createDataFrame(
        [(f"{http_base}/cf/CZ1.html",), (f"{http_base}/missing",)], "url string"
    )
    out = {r.url: r.res for r in df.select(
        "url", fetch_html("url").alias("res")
    ).collect()}
    ok = out[f"{http_base}/cf/CZ1.html"]
    assert ok.status == 200 and "case /cf/CZ1.html" in ok.body and ok.error is None
    bad = out[f"{http_base}/missing"]
    assert bad.body is None and bad.error == "http 404"


def test_fetch_binary_failure_tolerated(spark, http_base):
    from shippai_knowledge_etl_spark.sources.fetch import fetch_binary

    df = spark.createDataFrame(
        [
            (f"{http_base}/img/a.png",),
            ("http://127.0.0.1:1/unreachable",),  # connection refused
        ],
        "url string",
    )
    rows = df.select("url", fetch_binary("url").alias("r")).collect()
    by = {r.url: r.r for r in rows}
    img = by[f"{http_base}/img/a.png"]
    assert bytes(img.content).startswith(b"\x89PNGfake")
    dead = by["http://127.0.0.1:1/unreachable"]
    assert dead.content is None and dead.error  # null + reason, task alive


def test_fetch_parse_pipeline(spark, http_base):
    """S1→P2 composed: fetch a generated page, parse it, filter labels —
    the reference's fetch_html→parse_main_page seam, end-to-end."""
    from shippai_knowledge_etl_spark.sources.fetch import fetch_html
    from shippai_knowledge_etl_spark.sources.html_parse import html_to_rows

    df = spark.createDataFrame([(f"{http_base}/cf/CZ9.html",)], "url string")
    rows = (
        df.select(fetch_html("url").alias("res"))
        .select(F.explode(html_to_rows(F.col("res.body"))).alias("r"))
    )
    # the loopback page has no tables — parse yields zero rows, no error
    assert rows.count() == 0
