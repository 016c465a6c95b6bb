"""Golden tests for the scalar/fold function library.

Expected values come from independent pure-Python implementations of the
reference's documented behavior (requirements.md + SURVEY.md §2.3) —
not from the Spark code under test — so these catch semantic drift the
SQL oracles can't (continuation-line merging, degenerate inputs).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.functions import listparse, scalar


# --- pure-python goldens (behavior per src/extract.py:149-180 spec) ------

def golden_bullet(text: str) -> list[str]:
    items: list[str] = []
    for line in (l.strip() for l in text.split("\n")):
        if not line:
            continue
        if line.startswith("・"):
            items.append(line[1:].strip())
        elif items:
            items[-1] += line
    return items


def golden_numbered(text: str) -> list[str]:
    items: list[str] = []
    current: list[str] = []
    for line in (l.strip() for l in text.split("\n")):
        if not line:
            continue
        if re.match(r"^[0-9０-９]+[．.]\s*", line):
            if current:
                items.append("".join(current))
            current = [re.sub(r"^[0-9０-９]+[．.]\s*", "", line)]
        elif current:
            current.append(line)
    if current:
        items.append("".join(current))
    return items


def golden_knowledge(text: str) -> list[str]:
    text = text.strip()
    if "・" in text:
        return golden_bullet(text)
    if re.search(r"^[0-9０-９]+[．.]\s*", text, re.MULTILINE):
        return golden_numbered(text)
    return [text] if text else []


def golden_paragraphs(text: str) -> str:
    lines = [line.strip() for line in text.split("\n")]
    paragraphs, current = [], []
    for line in lines:
        if line:
            current.append(line)
        elif current:
            paragraphs.append("\n".join(current))
            current = []
    if current:
        paragraphs.append("\n".join(current))
    return "\n\n".join(paragraphs)


KNOWLEDGE_CASES = [
    "・first item\n・second item\ncontinuation merged\n・third",
    "continuation before any item is dropped\n・only item",
    "1. one\nmerged\n2. two\n3. three",
    "１．full width\nふた続き\n２．second",
    "12．multi digit\n1.dot no space",
    "plain single item text",
    "  \n  ",
    "",
    "・",
    "0. zero\n\n\n1. one after blanks",
]

PARAGRAPH_CASES = [
    "line one\nline two\n\npara two\n",
    "\n\n  \n a \n\n\n b \n\n",
    "single",
    "",
    "  spaced  \n\ttabbed\t\n\nnext",
]


@pytest.fixture(scope="module")
def run_expr(spark):
    def _run(values: list[str], expr):
        df = spark.createDataFrame([(v,) for v in values], "t string")
        return [r["out"] for r in df.select(expr(F.col("t")).alias("out")).collect()]

    return _run


def test_parse_knowledge_golden(run_expr):
    got = run_expr(KNOWLEDGE_CASES, listparse.parse_knowledge)
    want = [golden_knowledge(t) for t in KNOWLEDGE_CASES]
    assert got == want


def test_paragraphs_golden(run_expr):
    got = run_expr(PARAGRAPH_CASES, scalar.paragraphs)
    want = [golden_paragraphs(t) for t in PARAGRAPH_CASES]
    assert got == want


def test_date_normalize_golden(run_expr):
    cases = [
        "2006年06月15日",
        "2006年6月5日",
        "平成18年",
        "1999年12月31日 ごろ",
        "",
        "2020年13月40日",  # reference does not range-check — formats anyway
    ]

    def golden(t: str) -> str:
        m = re.search(r"(\d{4})年(\d{1,2})月(\d{1,2})日", t)
        if m:
            return f"{m.group(1)}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
        return t

    got = run_expr(cases, scalar.normalize_jp_date)
    assert got == [golden(t) for t in cases]


def test_leading_int_golden(run_expr):
    cases = ["3名", "約12名が負傷", "なし", "", "0人", "12345"]
    got = run_expr(cases, scalar.leading_int)
    want = [int(m.group()) if (m := re.search(r"\d+", t)) else 0 for t in cases]
    assert got == want


def test_split_filename_limit2(run_expr):
    cases = ["CZ0001_name_with_under", "a_b", "nounderscore"]
    got = run_expr(cases, lambda c: F.array(*scalar.split_filename(c)))
    assert got[0] == ["CZ0001", "name_with_under"]
    assert got[1] == ["a", "b"]
    assert got[2] == ["nounderscore", None]


def test_scale_to_fit_never_upscales(run_expr):
    out = run_expr(
        ["x"],
        lambda c: F.array(
            *scalar.scale_to_fit(F.lit(100.0), F.lit(50.0), 480.0, 360.0)
        ),
    )
    assert out[0] == [100.0, 50.0]
    out2 = run_expr(
        ["x"],
        lambda c: F.array(
            *scalar.scale_to_fit(F.lit(960.0), F.lit(360.0), 480.0, 360.0)
        ),
    )
    assert out2[0] == [480.0, 180.0]


def test_separator_decode_examples(run_expr):
    # width 15 → first group (items 1-3); width 35 → after item 6.
    out = run_expr(
        ["x"],
        lambda c: F.array(
            scalar.separator_item_after(F.lit(15)),
            scalar.separator_item_after(F.lit(35)),
            scalar.separator_item_after(F.lit(55)),
        ),
    )
    assert out[0] == [3, 6, 9]


URLJOIN_CASES = [
    # (base page url, href) — golden is urllib.parse.urljoin itself
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "CZ0000002.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "../sf/x.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "../../mf/m1.jpg"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "../../../too/far.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "/fkd/sf/y.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "http://other.org/a.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "https://other.org/a.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "//cdn.example.org/img.png"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "./same/dir.html"),
    ("https://www.shippai.org/fkd/cf/CZ0000001.html", "a/./b/../c.html"),
    ("https://www.shippai.org/fkd/cf/", "sub/page.html"),
    ("https://www.shippai.org/fkd/cf/", ".."),
    ("https://www.shippai.org/fkd/cf/", "../"),
    ("https://www.shippai.org", "page.html"),
    ("https://www.shippai.org/", "page.html"),
    # query/fragment shapes (reference list pages carry ?page= params)
    ("https://www.shippai.org/fkd/cf/CZ1.html?v=a/b", "x.html"),
    ("https://www.shippai.org/fkd/cf/CZ1.html?old=1", "?new=2"),
    ("https://www.shippai.org/fkd/cf/CZ1.html", "y.html?page=2"),
    ("https://www.shippai.org/fkd/lis/l.html?p=1", "../cf/CZ2.html"),
    ("https://www.shippai.org/fkd/cf/CZ1.html", "z.html#frag"),
]


def test_resolve_url_matches_urljoin(spark):
    """F10: resolve_url must agree with urllib.parse.urljoin on every
    href shape the reference can encounter (src/extract.py:206,210)."""
    from urllib.parse import urljoin

    df = spark.createDataFrame(URLJOIN_CASES, "base string, href string")
    got = [
        r["out"]
        for r in df.select(
            scalar.resolve_url(F.col("base"), F.col("href")).alias("out")
        ).collect()
    ]
    want = [urljoin(b, h) for b, h in URLJOIN_CASES]
    assert got == want, list(zip(URLJOIN_CASES, got, want))


def test_winnow_coverage_and_density(spark):
    """Winnowing guarantees: a shared passage of >= w+k-1 tokens yields
    a shared fingerprint; selection density stays near 2/(w+1)."""
    import json

    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.textops import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    rows = [
        ("a", "one two three " + shared + " four five six"),
        ("b", "seven eight " + shared + " nine ten eleven twelve"),
        ("c", "totally different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: set(json.loads(r["fp"]))
        for r in df.select(
            "id", F.to_json(winnow_fingerprints(F.col("text"))).alias("fp")
        ).collect()
    }
    assert got["a"] & got["b"], "shared passage must share a fingerprint"
    assert not (got["a"] & got["c"])

    # all-distinct tokens: the 2/(w+1) density law assumes distinct
    # gram hashes (repeats collapse under array_distinct)
    long_doc = " ".join(f"tok{i}" for i in range(400))
    n_grams = 400 - 5 + 1
    sel = json.loads(
        spark.createDataFrame([(long_doc,)], ["text"])
        .select(F.to_json(winnow_fingerprints(F.col("text"))).alias("fp"))
        .collect()[0]["fp"]
    )
    density = len(sel) / n_grams
    assert 0.2 < density < 0.6, density  # expected ~2/(w+1)=0.4


def test_collocation_pmi_planted(spark):
    """Deterministic-corpus PMI: two exclusive pairs each seen 10 of 20
    bigrams -> pmi = ln(10*20/(10*10)) = ln 2; sub-threshold pairs are
    dropped but still count toward the marginals."""
    import math

    from shippai_knowledge_etl_spark.operators.textops import collocation_pmi

    rows = [(i, "strong coffee") for i in range(10)]
    rows += [(i + 10, "weak tea") for i in range(10)]
    rows += [(20, "strong tea")]  # below min_count, inflates marginals
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["tok_a"], r["tok_b"]): (r["n_cooccur"], r["pmi"])
        for r in collocation_pmi(df, min_count=5).collect()
    }
    assert set(got) == {("strong", "coffee"), ("weak", "tea")}
    # T=21 bigrams, left(strong)=11, right(coffee)=10
    assert got[("strong", "coffee")] == (
        10,
        round(math.log(10 * 21 / (11 * 10)), 6),
    )
    # left(weak)=10, right(tea)=11
    assert got[("weak", "tea")] == (
        10,
        round(math.log(10 * 21 / (10 * 11)), 6),
    )


def test_markov_transitions_rows_normalize(spark):
    """Each prev_type's outgoing probabilities sum to ~1 and the
    transition total is exactly n_events - n_users (first event of
    every user has no predecessor)."""
    from collections import defaultdict

    from shippai_knowledge_etl_spark.catalog import load_catalog

    sf = "/root/testdata/sf0.001"
    out = load_catalog()["w13_markov_transitions"].fn(spark, sf).collect()
    by_prev = defaultdict(float)
    n_trans = 0
    for r in out:
        by_prev[r["prev_type"]] += r["prob"]
        n_trans += r["n_transitions"]
    assert by_prev and all(abs(s - 1.0) < 1e-4 for s in by_prev.values())
    ev = spark.read.parquet(f"{sf}/events.parquet")
    assert n_trans == ev.count() - ev.select("user_id").distinct().count()


def test_zorder_key_locality_and_roundtrip(spark):
    """Morton key properties: (a) exact interleave roundtrip — even
    bits reassemble x, odd bits reassemble y; (b) quadrant locality —
    the top two key bits are exactly (y_msb, x_msb)."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.layout import zorder_key2

    pts = [(x, y) for x in (0, 1, 5, 255, 256, 65535)
           for y in (0, 2, 7, 128, 40000)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        "x", "y", zorder_key2(F.col("x"), F.col("y"), bits=16).alias("z")
    ).collect()
    for r in rows:
        x_back = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(16))
        y_back = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x_back, y_back) == (r["x"], r["y"])
        assert (r["z"] >> 31) & 1 == (r["y"] >> 15) & 1
        assert (r["z"] >> 30) & 1 == (r["x"] >> 15) & 1


def test_attribution_last_touch_semantics(spark):
    """Every purchase appears exactly once; the credited touch is the
    latest non-purchase event strictly before the conversion (verified
    per row against a pure-Python replay at sf0.001)."""
    from collections import defaultdict

    from shippai_knowledge_etl_spark.catalog import load_catalog

    sf = "/root/testdata/sf0.001"
    out = {
        r["conv_event_id"]: r
        for r in load_catalog()["w14_attribution_last_touch"]
        .fn(spark, sf)
        .collect()
    }
    ev = sorted(
        (
            int(r["t"]),
            int(r["event_id"]),
            int(r["user_id"]),
            r["event_type"],
        )
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "CAST(unix_timestamp(ts) AS LONG) t",
            "event_id",
            "user_id",
            "event_type",
        )
        .collect()
    )
    purchases = [e for e in ev if e[3] == "purchase"]
    assert set(out) == {e[1] for e in purchases}
    by_user = defaultdict(list)
    for e in ev:
        by_user[e[2]].append(e)
    for t, eid, uid, _ in purchases:
        prior = [
            e for e in by_user[uid]
            if (e[0], e[1]) < (t, eid) and e[3] != "purchase"
        ]
        want = max(prior) if prior else None
        got = out[eid]
        if want is None:
            assert got["touch_event_id"] is None
        else:
            assert got["touch_event_id"] == want[1]
            assert got["touch_type"] == want[3]
            assert got["gap_s"] == t - want[0]


def test_heaps_fit_growth_regimes(spark):
    """Linear vocabulary growth fits beta ~ 1, a saturated one-token
    corpus fits beta = 0 (the templated-corpus flag), and the pinned
    synthetic corpus is detected as saturated."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.catalog import load_catalog

    fn = load_catalog()["ext_heaps_fit"].fn

    def fit(rows):
        df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
            "doc_id", "text",
            F.lit("en").alias("lang"), F.lit("s").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            return fn(spark, td).collect()[0]

    # every doc introduces 3 brand-new tokens -> V(n) = 3n -> beta ~ 1
    linear = fit(
        [(i, f"tok{3*i} tok{3*i+1} tok{3*i+2}") for i in range(100)]
    )
    assert 0.9 <= linear["beta"] <= 1.1, linear

    # one global token -> V saturates at 1 -> beta = 0
    flat = fit([(i, "same same same") for i in range(100)])
    assert flat["beta"] == 0.0

    pinned = fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert pinned["n_points"] == 10 and pinned["beta"] == 0.0


def test_salted_skew_join_keeps_shuffle_shape(spark):
    """The demo exists to show the salted SHUFFLE join: if the merge
    hint is ever dropped, Spark broadcasts the tiny build side and
    the plan silently stops demonstrating skew mitigation."""
    from shippai_knowledge_etl_spark.catalog import load_catalog

    df = load_catalog()["j7_salted_skew_join"].fn(
        spark, "/root/testdata/sf0.001"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin [user_id" in phys
    assert "BroadcastHashJoin" not in phys


def test_cusum_window_identity(spark):
    """The prefix-sum-minus-running-min rewrite equals the textbook
    recurrence C_t = max(0, C_{t-1} + x_t - k) on the pinned corpus."""
    from shippai_knowledge_etl_spark.catalog import load_catalog

    sf = "/root/testdata/sf0.001"
    out = sorted(
        (r["day"], r["n"], r["cusum"])
        for r in load_catalog()["w15_cusum_drift"].fn(spark, sf).collect()
    )
    days = [(d, n) for d, n, _ in out]
    k = sum(n for _, n in days) // len(days)
    c = 0
    for (d, n, got), (_, x) in zip(out, days):
        c = max(0, c + x - k)
        assert got == c, (d, got, c)


def test_bootstrap_ci_brackets_mean(spark):
    """The deterministic bootstrap CI brackets the full-sample mean,
    is ordered, and reproduces exactly across runs."""
    from shippai_knowledge_etl_spark.catalog import load_catalog

    fn = load_catalog()["a_bootstrap_ci"].fn
    r = fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
    assert r["ci_lo"] < r["ci_hi"]
    r2 = fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.asDict() == r2.asDict()


def test_key_skew_gini_extremes(spark):
    """Gini formula sanity on the pinned corpus: bounded in [0, 1),
    top-1 share >= 1/n_keys, and n_rows reconciles with the table."""
    from shippai_knowledge_etl_spark.catalog import load_catalog

    r = (
        load_catalog()["profile_key_skew"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    assert 0.0 <= r["gini"] < 1.0
    assert r["top1_share"] >= 1.0 / r["n_keys"]
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert r["n_rows"] == ev.count()
    assert r["n_keys"] == ev.select("user_id").distinct().count()


def test_time_weighted_avg_semantics(spark):
    """TWA weights each value by how long it was current: a planted
    series holding 10.0 for 9s then 0.0 for 1s averages 9.0 (a plain
    mean would say 5.0); single-sample users fall back to the value."""
    import datetime
    import os
    import tempfile

    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return base + datetime.timedelta(seconds=s)

    rows = [
        # user 1: 10.0 over [0,9), 0.0 at t=9 -> area 90 / span 10... 
        # span = 10? t_last - t_first = 10; value 0.0 holds [9,10)? no:
        # last sample has no next -> excluded; span 9? t: 0, 9, 10
        (1, ts(0), 1, 10.0),
        (2, ts(9), 1, 0.0),
        (3, ts(10), 1, 0.0),
        (4, ts(0), 2, 42.5),  # single sample -> twa = value, span 0
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"]
    ).select(
        "event_id", "ts", "user_id", "value",
        F.lit("{}").alias("props"), F.lit("click").alias("event_type"),
    )
    with tempfile.TemporaryDirectory() as td:
        df.select("event_id", "ts", "user_id", "event_type", "value",
                  "props").write.parquet(os.path.join(td, "events.parquet"))
        out = {
            r["user_id"]: r
            for r in load_catalog()["w16_time_weighted_avg"]
            .fn(spark, td)
            .collect()
        }
    # user 1: areas 10.0*9 + 0.0*1 = 90 over span 10 -> 9.0
    assert out[1]["span_s"] == 10 and out[1]["twa"] == 9.0
    assert out[2]["span_s"] == 0 and out[2]["twa"] == 42.5


def test_gapfill_locf_grid_and_fill(spark):
    """The grid is dense between each user's first and last bucket,
    filled buckets carry the last observed bucket's CLOSING value,
    and observed buckets show their own closing value."""
    from collections import defaultdict

    from shippai_knowledge_etl_spark.catalog import load_catalog

    out = (
        load_catalog()["w17_gapfill_locf"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_user = defaultdict(list)
    for r in out:
        by_user[r["user_id"]].append(r)
    assert by_user
    for rows in by_user.values():
        rows.sort(key=lambda r: r["bkt"])
        bkts = [r["bkt"] for r in rows]
        assert bkts == list(range(bkts[0], bkts[-1] + 1))  # dense grid
        assert rows[0]["n_obs"] > 0 and not rows[0]["filled"]
        last_seen = None
        for r in rows:
            assert r["filled"] == (r["n_obs"] == 0)
            if r["n_obs"] > 0:
                last_seen = r["x_locf"]
            else:
                assert r["x_locf"] == last_seen  # LOCF carries forward


def test_lttb_kernel_golden_and_invariants(spark):
    """Golden: on a spike series LTTB keeps the spike; invariants:
    endpoints kept, size min(k, n), output subset of input, kept_rank
    dense, deterministic across runs."""
    from shippai_knowledge_etl_spark.operators.timeseries import (
        _lttb,
        lttb_downsample,
    )

    # pure-kernel golden: flat line with one spike at index 7
    ts = list(range(12))
    xs = [0.0] * 12
    xs[7] = 100.0
    kept = _lttb(ts, xs, 5)
    assert kept[0] == 0 and kept[-1] == 11
    assert 7 in kept  # the spike survives
    assert len(kept) == 5 and kept == sorted(kept)

    rows = [(1, t, x) for t, x in zip(ts, xs)]
    rows += [(2, t, float(t)) for t in range(4)]  # short series: n <= k
    df = spark.createDataFrame(rows, ["user_id", "t", "x"])
    out = lttb_downsample(df, "user_id", "t", "x", k=5).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["kept_rank"])
    assert [r["t"] for r in u1][0] == 0 and [r["t"] for r in u1][-1] == 11
    assert any(r["x"] == 100.0 for r in u1)
    assert len(u1) == 5
    assert {(r["t"], r["x"]) for r in u1} <= {(t, x) for t, x in zip(ts, xs)}
    assert [r["kept_rank"] for r in u1] == [0, 1, 2, 3, 4]
    u2 = by_user[2]
    assert len(u2) == 4  # short series passes through whole
    out2 = lttb_downsample(df, "user_id", "t", "x", k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_burst_detection_planted_spike(spark):
    """A planted 10x single-day spike on one type flags is_burst for
    exactly that (type, day); steady types never flag."""
    import datetime
    import os
    import tempfile

    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)
    rows, eid = [], 0
    for day in range(14):
        for _ in range(5):  # steady: 5/day
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "steady", 1.0, "{}"))
            eid += 1
        n = 50 if day == 10 else 5  # spiky: 10x on day 10
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "spiky", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = (
            load_catalog()["w19_burst_detection"]
            .fn(spark, td)
            .collect()
        )
    flagged = {(r["event_type"], r["day"]) for r in out if r["is_burst"]}
    day0 = min(r["day"] for r in out)
    assert flagged == {("spiky", day0 + 10)}


def test_referential_integrity_detects_planted_orphans(spark):
    """Planted FK breaks are counted on exactly the right edge; a
    clean snapshot reports zeros (the pinned corpus is clean)."""
    import os
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    fn = load_catalog()["quality_referential_integrity"].fn
    clean = fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert (
        clean["orphan_orders"],
        clean["orphan_lineitems"],
        clean["orphan_part_refs"],
        clean["orphan_supp_refs"],
    ) == (0, 0, 0, 0)

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, "c", 0.0, "B")],
            "c_custkey long, c_name string, c_acctbal double,"
            " c_mktsegment string",
        ).write.parquet(os.path.join(td, "customer.parquet"))
        spark.createDataFrame(
            # order 20 references missing customer 99
            [(10, 1, "O", 5.0, "1-URGENT"), (20, 99, "O", 5.0, "1-URGENT")],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderpriority string",
        ).write.parquet(os.path.join(td, "orders.parquet"))
        spark.createDataFrame(
            # line 2 references missing order 77; line 3 missing part 55
            [(10, 1, 1, 1.0), (77, 1, 1, 1.0), (10, 55, 1, 1.0)],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_quantity double",
        ).write.parquet(os.path.join(td, "lineitem.parquet"))
        spark.createDataFrame(
            [(1, "p")], "p_partkey long, p_name string"
        ).write.parquet(os.path.join(td, "part.parquet"))
        spark.createDataFrame(
            [(1, "s")], "s_suppkey long, s_name string"
        ).write.parquet(os.path.join(td, "supplier.parquet"))
        r = fn(spark, td).collect()[0]
    assert r["orphan_orders"] == 1
    assert r["orphan_lineitems"] == 1
    assert r["orphan_part_refs"] == 1
    assert r["orphan_supp_refs"] == 0
    assert (r["n_orders"], r["n_lineitems"]) == (2, 3)


def test_forecast_backtest_perfect_on_weekly_periodic(spark):
    """A perfectly 7-day-periodic series backtests to MAE 0 and zero
    bias; a trending series shows positive bias (under-forecast)."""
    import datetime
    import os
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 3, 1)
    rows, eid = [], 0
    for day in range(21):
        for _ in range(3 + (day % 7)):  # periodic: same weekday = same n
            rows.append((eid, base + datetime.timedelta(days=day), eid % 2, "periodic", 1.0, "{}"))
            eid += 1
        for _ in range(day + 1):  # trending: grows every day
            rows.append((eid, base + datetime.timedelta(days=day), eid % 2, "trending", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = {
            r["event_type"]: r
            for r in load_catalog()["w20_forecast_backtest"]
            .fn(spark, td)
            .collect()
        }
    assert out["periodic"]["mae"] == 0.0
    assert out["periodic"]["bias_sum"] == 0
    assert out["trending"]["bias_sum"] == 7 * 14  # +7/day over 14 days
    assert out["trending"]["mae"] == 7.0


def _write_events(spark, td, rows):
    import os

    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.parquet(os.path.join(td, "events.parquet"))


def test_ewma_constant_series_is_identity(spark):
    """A constant daily volume must smooth to itself exactly (kernel
    weights sum to 127 → num = 127·n), and the first 6 grid days emit
    NULL — never a silently-underweighted average."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)
    rows, eid = [], 0
    for day in range(10):
        for _ in range(4):
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "flat", 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = load_catalog()["w21_ewma_smoother"].fn(spark, td).collect()
    by_day = {r["day"]: r for r in sorted(out, key=lambda r: r["day"])}
    days = sorted(by_day)
    for d in days[:6]:
        assert by_day[d]["ewma"] is None
    for d in days[6:]:
        assert by_day[d]["ewma"] == 4.0
        assert by_day[d]["ewma_num"] == 127 * 4


def test_ewma_reacts_with_dyadic_weights(spark):
    """Day after a single 10x spike, the smoother carries exactly the
    32/127 tap of it — the kernel is the documented dyadic one."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)
    rows, eid = [], 0
    for day in range(10):
        n = 40 if day == 8 else 4
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "spiky", 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = load_catalog()["w21_ewma_smoother"].fn(spark, td).collect()
    by_day = {r["day"]: r for r in out}
    d0 = min(by_day)
    # day 9: weights (64·4 + 32·40 + (16+8+4+2+1)·4) = 1660
    assert by_day[d0 + 9]["ewma_num"] == 64 * 4 + 32 * 40 + 31 * 4
    assert by_day[d0 + 9]["ewma"] == round((64 * 4 + 32 * 40 + 31 * 4) / 127.0, 6)


def test_mad_outliers_flag_spike_not_neighbors(spark):
    """One 10x day flags itself and cannot drag the median/MAD enough
    to flag steady days — the robustness the trailing mean lacks."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)
    rows, eid = [], 0
    for day in range(15):
        # 4/5/6 alternation keeps MAD = 1 (a two-level series degrades
        # to MAD 0, where ANY deviation flags); one 10x spike on day 7
        n = 50 if day == 7 else 4 + (day % 3)
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "t", 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = load_catalog()["w22_mad_outliers"].fn(spark, td).collect()
    d0 = min(r["day"] for r in out)
    flagged = {r["day"] for r in out if r["is_outlier"]}
    assert flagged == {d0 + 7}


def test_theil_sen_ignores_single_spike(spark):
    """A flat series with one 10x day must still report slope 0 —
    the robustness least-squares lacks; a steadily rising series
    reports its exact unit slope."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)
    rows, eid = [], 0
    for day in range(12):
        for _ in range(50 if day == 5 else 5):  # flat + one spike
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "flat_spike", 1.0, "{}"))
            eid += 1
        for _ in range(3 + day):  # rising: slope exactly 1/day
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "rising", 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = {r["event_type"]: r for r in load_catalog()["w23_theil_sen_trend"].fn(spark, td).collect()}
    assert out["flat_spike"]["sen_slope"] == 0.0
    assert not out["flat_spike"]["rising"]
    assert out["rising"]["sen_slope"] == 1.0
    assert out["rising"]["rising"]


def test_ab_test_detects_planted_effect(spark):
    """A planted 2x conversion-rate difference must flag significant
    with the right sign; identical variants must not."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)

    def build(effect):
        rows = []
        for eid in range(4000):
            v = eid % 2
            # variant A converts at 20%; B at 20% or 10% (effect)
            thr = 5 if (v == 0 or not effect) else 10
            etype = "purchase" if eid // 2 % thr == 0 else "click"
            rows.append((eid, base + datetime.timedelta(minutes=eid % 600), eid % 40, etype, 1.0, "{}"))
        return rows

    from shippai_knowledge_etl_spark.catalog import load_catalog

    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, build(effect=True))
        out = load_catalog()["behavior_ab_test"].fn(spark, td).collect()[0]
    assert out["significant"]
    assert out["z_score"] > 0  # A converts more
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, build(effect=False))
        out = load_catalog()["behavior_ab_test"].fn(spark, td).collect()[0]
    assert not out["significant"]
    assert out["rate_a"] == out["rate_b"]


def test_interval_coverage_merges_overlaps(spark):
    """Three overlapping intervals count their union once; disjoint
    intervals sum; back-to-back intervals stay contiguous."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)

    def at(sec):
        return base + datetime.timedelta(seconds=sec)

    rows = [
        # user 1: events at 0s, 60s, 120s → union [0, 420) = 420s, 1 segment
        (1, at(0), 1, "click", 1.0, "{}"),
        (2, at(60), 1, "click", 1.0, "{}"),
        (3, at(120), 1, "click", 1.0, "{}"),
        # user 2: events at 0s and 1000s → 600s in 2 segments
        (4, at(0), 2, "click", 1.0, "{}"),
        (5, at(1000), 2, "click", 1.0, "{}"),
        # user 3: back-to-back at 0s and 300s → 600s, ONE segment
        (6, at(0), 3, "click", 1.0, "{}"),
        (7, at(300), 3, "click", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = {
            r["user_id"]: (r["covered_seconds"], r["n_segments"])
            for r in load_catalog()["w24_interval_coverage"].fn(spark, td).collect()
        }
    assert out[1] == (420, 1)
    assert out[2] == (600, 2)
    assert out[3] == (600, 1)


def test_anomaly_consensus_planted_spike_trips_all_three(spark):
    """A 10x spike after a steady full week must trip burst, MAD, and
    EWMA detectors at once → consensus; steady days trip none."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.catalog import load_catalog

    base = datetime.datetime(2026, 1, 1)
    rows, eid = [], 0
    for day in range(14):
        n = 50 if day == 10 else 4 + (day % 3)  # MAD-safe alternation
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(days=day, minutes=eid % 60), eid % 3, "t", 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = {r["day"]: r for r in load_catalog()["w28_anomaly_consensus"].fn(spark, td).collect()}
    d0 = min(out)
    spike = out[d0 + 10]
    assert spike["f_burst"] and spike["f_mad"] and spike["f_ewma"]
    assert spike["consensus"] and spike["n_flags"] == 3
    assert all(not r["consensus"] for d, r in out.items() if d != d0 + 10)


# ---------------------------------------------------------------------------
# Round-8 batch-2 operator contracts (oracle parity lives in
# test_oracle_parity.py; these pin the semantics the oracles share)
# ---------------------------------------------------------------------------


def test_bloom_contains_expr_never_false_negative(spark):
    """Every inserted key must probe true — the contract the runtime-
    filter join's result-invariance rests on; and at this load factor
    (200/65536 bits) absent keys are overwhelmingly rejected. Uses the
    array-literal probe form (the shipped one; the MapType and
    string-bitmap forms were measured pathological and removed — see
    sketches.bloom_word_values)."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators import sketches

    keys = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    bloom = sketches.bloom_build(keys, "k")
    words = sketches.bloom_word_values(bloom)
    assert len(words) == 4096 and sum(1 for w in words if w) > 0
    probes = spark.range(400).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        (F.col("id") < 200).alias("inserted"),
    )
    out = probes.select(
        "inserted",
        sketches.bloom_contains_array_expr(F.col("k"), words).alias("mc"),
    ).collect()
    assert all(r["mc"] for r in out if r["inserted"])  # NO false negatives
    fps = sum(1 for r in out if not r["inserted"] and r["mc"])
    assert fps <= 2  # geometry bound at n=200 is ~1e-5; 2 is generous


def test_km_survival_monotone_and_censor_semantics(spark, sf_dir):
    """Survival is non-increasing in lifetime; censored-only days keep
    the curve flat (they leave the risk pool without a hazard term)."""
    from shippai_knowledge_etl_spark.queries.windows import (
        behavior_survival_km,
    )

    rows = sorted(
        behavior_survival_km(spark, sf_dir).collect(),
        key=lambda r: r["lifetime_hours"],
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert r["survival"] <= prev + 1e-9
        if r["n_deaths"] == 0:
            assert abs(r["survival"] - prev) < 1e-9  # censor-only: flat
        prev = r["survival"]
    # every user leaves the pool exactly once
    assert rows[0]["n_at_risk"] == sum(
        r["n_deaths"] + r["n_censored"] for r in rows
    )


def test_chi2_independence_zero_on_constructed_independence(spark):
    """A table where every (lang, source) cell count is exactly
    row_share * col_share * N has chi2 == 0 — the statistic's fixed
    point, and a direct check that zero cells and expected counts are
    wired right."""
    import shippai_knowledge_etl_spark.queries.curate_ops as co

    rows = []
    did = 0
    # counts: lang weights 1:2, source weights 1:3 -> cells 1,3,2,6
    for lang, lw in (("aa", 1), ("bb", 2)):
        for src, swt in (("s1", 1), ("s2", 3)):
            for _ in range(lw * swt):
                rows.append((did, "t", lang, src, 1))
                did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = co.quality_chi2_independence(spark, d).collect()[0]
    assert out["chi2"] == 0.0 and out["df"] == 1


def test_encoding_advisor_rewards_sorted_runs(spark, sf_dir):
    """The advisor's run statistic reads TABLE ORDER: the random-order
    orders table yields short runs for o_orderstatus (dict), and the
    same column sorted would collapse to 3 runs — pinned by computing
    the run count directly on a sorted frame."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.queries.relational import (
        layout_encoding_advisor,
    )

    out = {r["col"]: r for r in layout_encoding_advisor(spark, sf_dir).collect()}
    assert out["o_custkey"]["recommendation"] == "plain"
    assert out["o_orderpriority"]["recommendation"] == "dict"
    # random order: many runs
    assert out["o_orderstatus"]["n_runs"] > out["o_orderstatus"]["n_distinct"] * 100


def test_cms_join_cardinality_one_sided(spark, sf_dir):
    from shippai_knowledge_etl_spark.queries.textops import (
        ext_cms_join_cardinality,
    )

    r = ext_cms_join_cardinality(spark, sf_dir).collect()[0]
    assert r["is_overestimate"]
    assert r["est_join_size"] >= r["exact_join_size"] > 0
    # the 2^16-bucket width keeps the planner estimate within 2x here
    assert r["est_join_size"] < 2 * r["exact_join_size"]


def test_fellegi_sunter_separates_planted_duplicates(spark, sf_dir):
    from shippai_knowledge_etl_spark.queries.dedup import (
        dedup_fellegi_sunter,
    )

    rows = dedup_fellegi_sunter(spark, sf_dir).collect()
    m = [r["score"] for r in rows if r["is_match"]]
    u = [r["score"] for r in rows if not r["is_match"]]
    assert m and u
    assert min(m) > max(u)  # clean threshold exists


def test_conformal_rank_matches_numpy(spark, sf_dir):
    """The exact-rank threshold equals the numpy-sorted calibration
    residual at ceil((n+1)*0.9), and held-out coverage is sane."""
    import math

    import duckdb

    from shippai_knowledge_etl_spark.queries.curate_ops import (
        quality_conformal_threshold,
    )

    r = quality_conformal_threshold(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id, abs(n_chars - 6 * len(list_filter(
              str_split(trim(regexp_replace(lower(text),
              '[^\\p{{L}}\\p{{Nd}}]+', ' ', 'g')), ' '), x -> x <> '')))
            FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE doc_id % 2 = 0"""
    ).fetchall()
    scores = sorted(nc for _, nc in rows)
    k = math.ceil((len(scores) + 1) * 0.9)
    assert r["n_cal"] == len(scores) and r["rank_idx"] == k
    assert r["threshold"] == scores[k - 1]
    assert 0.75 <= r["coverage"] <= 1.0


def test_ece_terms_recompute_from_raw(spark, sf_dir):
    """ece_term_scaled must equal |1000*n_pos - sum_conf| per bucket
    (the integer identity) and the bucket populations must partition
    the corpus."""
    import duckdb

    from shippai_knowledge_etl_spark.queries.curate_ops import (
        quality_calibration_ece,
    )

    rows = quality_calibration_ece(spark, sf_dir).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert r["ece_term_scaled"] == abs(
            1000 * r["n_pos"] - r["sum_conf"]
        )
        assert 0 <= r["n_pos"] <= r["n"]


def test_bradley_terry_win_conservation(spark, sf_dir):
    """Total wins == total matches (each match crowns exactly one
    winner), and an all-wins player outranks an all-losses player."""
    from shippai_knowledge_etl_spark.queries.windows import (
        behavior_bradley_terry,
    )

    rows = behavior_bradley_terry(spark, sf_dir).collect()
    total_wins = sum(r["wins"] for r in rows)
    total_games = sum(r["games"] for r in rows)
    assert total_games == 2 * total_wins  # each match counts 2 games
    best = max(rows, key=lambda r: r["wins"] / r["games"])
    worst = min(rows, key=lambda r: r["wins"] / r["games"])
    assert best["strength_scaled"] > worst["strength_scaled"]


def test_personalized_pagerank_mass_reaches_only_seed_neighborhood(
    spark, sf_dir
):
    """Rank > 0 implies the node is within 3 forward hops of a seed
    (3 iterations propagate teleport mass at most 3 edges)."""
    import duckdb

    from shippai_knowledge_etl_spark.queries.dedup import (
        graph_personalized_pagerank,
    )

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    reach = {i for i in range(0, n, 50)}  # seeds
    frontier = set(reach)
    for _ in range(3):
        frontier = {
            d
            for s in frontier
            for d in ((s * 7 + 1) % n, (s * 13 + 2) % n)
            if d != s
        }
        reach |= frontier
    for r in graph_personalized_pagerank(spark, sf_dir).collect():
        if r["rank_scaled"] > 0:
            assert r["doc_id"] in reach


def test_session_grammar_flags_recompute_from_seq(spark, sf_dir):
    """The three grammar flags must be pure functions of the emitted
    sequence string — recomputed in Python regex for every session."""
    import re

    from shippai_knowledge_etl_spark.queries.windows import (
        behavior_session_grammar,
    )

    pat = re.compile(
        r"^(signup>)?(view|click)(>(view|click))*>purchase(>.*)?$"
    )
    for r in behavior_session_grammar(spark, sf_dir).collect():
        assert r["clean_funnel"] == bool(pat.match(r["seq"]))
        assert r["error_touched"] == ("error" in r["seq"])
        assert r["browse_only"] == ("purchase" not in r["seq"])


def test_lateness_profile_cumulative_contract(spark, sf_dir):
    from shippai_knowledge_etl_spark.queries.windows import (
        stream_lateness_profile,
    )

    rows = sorted(
        stream_lateness_profile(spark, sf_dir).collect(),
        key=lambda r: r["late_hours"],
    )
    assert rows[-1]["cum_frac"] == 1.0
    fracs = [r["cum_frac"] for r in rows]
    assert fracs == sorted(fracs)
    assert rows[-1]["cum_n"] == sum(r["n"] for r in rows)
    # covers_p95 is monotone once true
    seen = False
    for r in rows:
        if r["covers_p95"]:
            seen = True
        else:
            assert not seen


def test_ivm_consistency_is_not_vacuous(spark, sf_dir):
    """The maintained aggregate really changed (the delta is nonzero)
    AND equals recomputation — a no-op delta would make the contract
    vacuous."""
    from shippai_knowledge_etl_spark.queries.curate_ops import (
        quality_ivm_delta,
    )

    rows = quality_ivm_delta(spark, sf_dir).collect()
    assert all(r["consistent"] for r in rows)
    # at least one source actually absorbed a delta
    import duckdb

    base = {
        s: t
        for s, t in duckdb.sql(
            f"""SELECT source, sum(len(str_split(text, ' ')))
                FROM read_parquet('{sf_dir}/documents.parquet')
                GROUP BY source"""
        ).fetchall()
    }
    changed = [
        r for r in rows if r["n_tokens_maintained"] != base.get(r["source"])
    ]
    assert changed  # the planted appends moved the rollup


def test_hilbert_unit_step_full_grid(spark):
    """The unrolled order-4 Hilbert expressions produce a bijection of
    0..255 whose consecutive cells are Manhattan-adjacent EVERYWHERE
    (total travel 255, max jump 1) — while Morton pays 480 with
    quadrant-seam jumps — on the full 16×16 grid. This is the locality
    property layout_hilbert_order quantifies on occupied cells."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.queries.relational import (
        _hilbert_stages,
        _zorder4,
    )

    cells = spark.range(256).selectExpr("id % 16 AS x0", "id div 16 AS y0")
    h = cells.selectExpr("x0", "y0", "x0 AS x", "y0 AS y", "0 AS d")
    for rx, ry, d, nx, ny in _hilbert_stages("div"):
        h = h.selectExpr(
            "x0", "y0", "x", "y", "d", f"{rx} AS rx", f"{ry} AS ry"
        ).selectExpr("x0", "y0", f"{d} AS d", f"{nx} AS x", f"{ny} AS y")
    hpos = {r.d: (r.x0, r.y0) for r in h.collect()}
    assert sorted(hpos) == list(range(256))  # bijection
    hsteps = [
        abs(hpos[t][0] - hpos[t + 1][0]) + abs(hpos[t][1] - hpos[t + 1][1])
        for t in range(255)
    ]
    assert sum(hsteps) == 255 and max(hsteps) == 1
    z = cells.selectExpr(
        "x0",
        "y0",
        _zorder4("div").replace("x ", "x0 ").replace("y ", "y0 ") + " AS k",
    )
    zpos = {r.k: (r.x0, r.y0) for r in z.collect()}
    assert sorted(zpos) == list(range(256))
    zsteps = [
        abs(zpos[t][0] - zpos[t + 1][0]) + abs(zpos[t][1] - zpos[t + 1][1])
        for t in range(255)
    ]
    assert sum(zsteps) == 480 and max(zsteps) > 1
