"""End-to-end CLI test: the reference's run.py workflow against a
loopback HTTP site — list-page expansion, fetch fan-out, parse,
validation, per-case JSON naming contract, manifest sequencing, PDF
emission, and the empty-worklist exit code."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

CASE_OK = """
<html><table>
<tr><td bgcolor="#DFE9F2">事例名称</td><td>タンク爆発</td></tr>
<tr><td bgcolor="#DFE9F2">事例概要</td><td>summary text</td></tr>
<tr><td bgcolor="#DFE9F2">経過</td><td>process text</td></tr>
<tr><td bgcolor="#DFE9F2">原因</td><td>cause text</td></tr>
<tr><td bgcolor="#DFE9F2">対策</td><td>fix text</td></tr>
<tr><td bgcolor="#DFE9F2">シナリオ</td><td>scenario text</td></tr>
<tr><td bgcolor="#FFFFFF">無視</td><td>not a label cell</td></tr>
</table></html>
"""

# 原因 missing → excluded
CASE_MISSING = """
<html><table>
<tr><td bgcolor="#DFE9F2">事例名称</td><td>name only</td></tr>
<tr><td bgcolor="#DFE9F2">事例概要</td><td>summary</td></tr>
<tr><td bgcolor="#DFE9F2">経過</td><td>process</td></tr>
<tr><td bgcolor="#DFE9F2">対策</td><td>fix</td></tr>
<tr><td bgcolor="#DFE9F2">シナリオ</td><td>scenario</td></tr>
</table></html>
"""

LIST_PAGE = """
<html>
<ul class="other"><li><a href="/cf/DECOY.html">decoy</a></li></ul>
<ul class="list_all">
<li><a href="../cf/CA0000001.html">case 1</a></li>
<li><a href="../sf/noise.html">noise</a></li>
<li><a href="../cf/CA0000002.html">case 2</a></li>
<li><a href="../cf/CA0000003.html">case 3 (past limit)</a></li>
</ul></html>
"""


class _Site(BaseHTTPRequestHandler):
    def do_GET(self):
        pages = {
            "/fkd/lis/lis1.html": LIST_PAGE,
            "/fkd/cf/CA0000001.html": CASE_OK,
            "/fkd/cf/CA0000002.html": CASE_MISSING,
        }
        body = pages.get(self.path)
        if body is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.end_headers()
        self.wfile.write(body.encode("utf-8"))

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def site():
    srv = HTTPServer(("127.0.0.1", 0), _Site)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/fkd"
    srv.shutdown()


@pytest.mark.slow
def test_cli_end_to_end(spark, site, tmp_path):
    from shippai_knowledge_etl_spark.run import main

    out = tmp_path / "data"
    rc = main(
        [
            f"{site}/lis/lis1.html",
            f"{site}/cf/CA0000404.html",  # 404 → status error
            f"{site}/xx/unknown.html",  # warn + skip
            "--limit", "2",  # CA0000003 dropped by the per-list limit
            "--output-dir", str(out),
            "--pdf",
        ]
    )
    assert rc == 0

    # success artifacts: naming contract + verbatim UTF-8 fields
    case_json = out / "CA0000001_タンク爆発.json"
    assert case_json.exists(), sorted(p.name for p in out.iterdir())
    doc = json.loads(case_json.read_text(encoding="utf-8"))
    assert doc["summary"] == "summary text"
    assert doc["scenario"] == "scenario text"
    assert (out / "CA0000001.pdf").exists()

    # manifest: sequencing + summary + per-status payloads
    manifest = json.loads((out / "results_001.json").read_text("utf-8"))
    assert manifest["summary"] == {
        "total": 3, "n_success": 1, "n_excluded": 1, "n_error": 1,
    }
    by_id = {c["case_id"]: c for c in manifest["cases"]}
    assert by_id["CA0000001"]["output"] == "CA0000001_タンク爆発.json"
    assert by_id["CA0000002"]["missing_fields"] == ["cause"]
    assert "404" in by_id["CA0000404"]["message"]

    # second run appends the sequence, never overwrites
    assert main([f"{site}/cf/CA0000001.html", "--output-dir", str(out)]) == 0
    assert (out / "results_002.json").exists()


def test_cli_empty_worklist_exits_1(spark, tmp_path):
    from shippai_knowledge_etl_spark.run import main

    assert main(["http://x/unknown/route.html",
                 "--output-dir", str(tmp_path)]) == 1
