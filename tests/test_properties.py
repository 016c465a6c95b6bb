"""Property-style checks (SURVEY.md §5.2) via hypothesis.

Random inputs go through the Spark expressions in batches; invariants
come from the reference's documented contracts:
  - flatten(chunk3(x)) == x, all-but-last groups have size 3
    (src/extract.py:370-371)
  - slice_categories partitions the items exactly (no loss, no overlap)
  - renumbering is dense 1..N (src/render_pdf.py:154-170)
  - status partition is exhaustive and disjoint (src/run.py:86-131)
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.functions import listparse, nested

tokens = st.lists(
    st.text(alphabet="abcdefg東京", min_size=1, max_size=5), min_size=0, max_size=20
)
boundary_sets = st.lists(
    st.integers(min_value=1, max_value=24), min_size=0, max_size=3, unique=True
).map(sorted)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def run_rows(spark):
    def _run(rows, schema, expr):
        df = spark.createDataFrame(rows, schema)
        return [r["out"] for r in df.select(expr.alias("out")).collect()]

    return _run


@given(batch=st.lists(tokens, min_size=1, max_size=8))
@_slow
def test_chunk3_roundtrip(run_rows, batch):
    out = run_rows(
        [(t,) for t in batch],
        "items array<string>",
        F.struct(
            F.flatten(nested.chunk(F.col("items"))).alias("flat"),
            nested.chunk(F.col("items")).alias("groups"),
        ),
    )
    for (items, r) in zip(batch, out):
        assert r.flat == items  # lossless, order-preserving
        for g in r.groups[:-1]:
            assert len(g) == 3  # all but last full
        if r.groups:
            assert 1 <= len(r.groups[-1]) <= 3


@given(batch=st.lists(st.tuples(tokens, boundary_sets), min_size=1, max_size=8))
@_slow
def test_slice_categories_partitions(run_rows, batch):
    out = run_rows(
        [(t, b) for t, b in batch],
        "items array<string>, boundaries array<int>",
        nested.slice_categories(F.col("items"), F.col("boundaries")),
    )
    for (items, bounds), r in zip(batch, out):
        assert r.cause + r.action + r.result == items  # exact partition


@given(
    batch=st.lists(
        st.text(alphabet="ab・12３．. \n", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@_slow
def test_parse_knowledge_total(run_rows, batch):
    from tests.test_functions import golden_knowledge

    out = run_rows(
        [(t,) for t in batch], "t string", listparse.parse_knowledge(F.col("t"))
    )
    for t, got in zip(batch, out):
        assert got == golden_knowledge(t)


def test_renumber_dense_and_partition_exhaustive(spark, sf_dir):
    from shippai_knowledge_etl_spark.operators import diagram
    from shippai_knowledge_etl_spark.queries.manifest import validated_orders
    from shippai_knowledge_etl_spark.queries.nested import (
        scenario_source,
        scenario_struct,
    )

    items = diagram.positioned_items(
        scenario_struct(scenario_source(spark, sf_dir)), "doc_id"
    )
    bad = items.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("num").alias("lo"),
        F.max("num").alias("hi"),
        F.countDistinct("num").alias("d"),
    ).filter(
        ~((F.col("lo") == 1) & (F.col("hi") == F.col("n")) & (F.col("d") == F.col("n")))
    )
    assert bad.count() == 0  # numbering dense 1..N per case

    v = validated_orders(spark, sf_dir)
    statuses = {r.status for r in v.select("status").distinct().collect()}
    assert statuses <= {"success", "excluded", "error"}
    total = v.count()
    by = dict(v.groupBy("status").count().collect())
    assert sum(by.values()) == total  # exhaustive + disjoint


@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=4),
        min_size=1,
        max_size=40,
    ),
    width=st.integers(min_value=1, max_value=8),
    overlap=st.integers(min_value=0, max_value=7),
)
@_slow
def test_chunking_covers_exactly_with_overlap(spark, words, width, overlap):
    """RAG chunker invariants for any (width, stride) geometry:
    dropping the first (width - stride) tokens of every non-first
    chunk reconstructs the document exactly — no loss, no duplication
    — and every chunk except the last has exactly `width` tokens."""
    from shippai_knowledge_etl_spark.operators.retrieval import chunk_tokens

    stride = max(1, width - overlap)
    df = spark.createDataFrame([(1, " ".join(words))], "id long, text string")
    rows = sorted(
        chunk_tokens(df, "id", "text", width, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = []
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["chunk_tokens"]
        if i < len(rows) - 1:
            assert len(toks) == width
        rebuilt.extend(toks if i == 0 else toks[width - stride:])
    assert rebuilt == words


@given(
    freqs=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=3),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
@_slow
def test_bm25_idf_orders_rarer_terms_higher(spark, freqs):
    """For equal tf and dl, a rarer query term must never score lower
    than a more common one (BM25 idf monotonicity)."""
    from shippai_knowledge_etl_spark.operators.retrieval import bm25_scores_dense

    docs = [(i, w) for i, (w, f) in enumerate(freqs) for _ in range(f)]
    df = spark.createDataFrame(
        [(j, t) for j, (_, t) in enumerate(docs)], "doc_id long, text string"
    )
    terms = tuple(sorted({w for w, _ in freqs}))
    out = bm25_scores_dense(df, "doc_id", "text", terms).collect()
    score_by_word = {}
    for r in out:
        word = docs[r["doc_id"]][1]
        score_by_word[word] = r["bm25"]
    dfreq = {w: f for w, f in freqs}
    ws = sorted(score_by_word)
    for a in ws:
        for b in ws:
            if dfreq[a] < dfreq[b]:
                assert score_by_word[a] >= score_by_word[b], (a, b)


@given(
    parts=st.lists(
        st.tuples(
            st.sampled_from(["p", "div", "li", "footer", "span", "a"]),
            st.text(
                alphabet="ab <>&\n\t東", min_size=0, max_size=12
            ),
        ),
        min_size=0,
        max_size=10,
    )
)
@settings(max_examples=40, deadline=None)
def test_block_parser_never_throws_and_preserves_text(parts):
    """The block-segmentation edge must survive arbitrary (including
    malformed) markup, and for well-formed flat block markup the
    concatenated block text equals the input text modulo whitespace
    collapsing."""
    from shippai_knowledge_etl_spark.sources.html_parse import parse_blocks

    # arbitrary junk: must not throw, offsets must be dense
    junk = "".join(f"<{t}>{txt}" for t, txt in parts) + "<p>tail"
    blocks = parse_blocks(junk)
    assert [b[0] for b in blocks] == list(range(len(blocks)))

    # well-formed flat markup: text preserved modulo whitespace
    import html
    import re

    flat = "".join(
        f"<p>{html.escape(txt)}</p>" for _, txt in parts
    )
    got = " ".join(b[2] for b in parse_blocks(flat))
    want = re.sub(r"\s+", " ", " ".join(txt for _, txt in parts)).strip()
    got_norm = re.sub(r"\s+", " ", got).strip()
    assert got_norm == want


# --- round-7 operators -----------------------------------------------------

_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=0,
    max_size=12,
)


@given(batch=st.lists(_words, min_size=2, max_size=7))
@_slow
def test_prefix_filter_equals_bruteforce_random(spark, batch):
    """Prefix filtering is LOSSLESS on random corpora: survivor pairs
    and intersection counts equal the brute-force shingle-set Jaccard
    at t = 1/2 (gram_n=2 so tiny docs still make shingles)."""
    from shippai_knowledge_etl_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(batch)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["n_inter"]
        for r in prefix_filter_pairs(
            df, "doc_id", "text", 1, 2, gram_n=2
        ).collect()
    }

    def sset(ws):
        if not ws:
            return {""}
        if len(ws) < 2:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    sets = {i: sset(ws) for i, ws in enumerate(batch)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and 2 * inter >= union:
                    want[(a, b)] = inter
    assert got == want


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=0,
    max_size=14,
)


@given(edges=_edges)
@_slow
def test_triangle_counts_match_bruteforce_random(spark, edges):
    """Degree-ordered triangle counting equals the O(n^3) brute force
    on random 8-node multigraphs (direction/self-loop noise included)."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.graph import triangle_counts

    nodes = spark.range(8).select(F.col("id"))
    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {n: set() for n in range(8)}
    for a, b in simple:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v in range(8):
        nb = sorted(adj[v])
        tri = sum(
            1
            for i in range(len(nb))
            for j in range(i + 1, len(nb))
            if nb[j] in adj[nb[i]]
        )
        deg = len(nb)
        want[v] = (deg, tri)
    if edges:
        df = spark.createDataFrame(edges, ["src", "dst"])
    else:
        df = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: (r["degree"], r["n_triangles"])
        for r in triangle_counts(nodes, df).collect()
    }
    assert got == want


@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**16 - 1),
            st.integers(min_value=0, max_value=2**16 - 1),
        ),
        min_size=1,
        max_size=24,
    )
)
@_slow
def test_zorder_roundtrip_random(spark, xs):
    """Random 16-bit pairs roundtrip exactly through the Morton key."""
    import pyspark.sql.functions as F

    from shippai_knowledge_etl_spark.operators.layout import zorder_key2

    df = spark.createDataFrame(xs, ["x", "y"])
    for r in df.select(
        "x", "y", zorder_key2(F.col("x"), F.col("y"), 16).alias("z")
    ).collect():
        xb = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(16))
        yb = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (xb, yb) == (r["x"], r["y"])


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "x", "y"]),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    ),
    n_terms=st.integers(min_value=1, max_value=4),
)
@_slow
def test_min_cover_span_equals_bruteforce_random(spark, docs, n_terms):
    """Adversarial pin for the round-8 proximity sweep: on random
    token streams and query-term subsets the window sort-sweep must
    equal the O(n^2) brute-force minimal cover span, doc for doc
    (docs missing a term are absent from both)."""
    from shippai_knowledge_etl_spark.operators import retrieval

    terms = tuple("abcd"[:n_terms])
    rows = [(i, toks) for i, toks in enumerate(docs)]
    hits = (
        spark.createDataFrame(rows, "doc_id int, toks array<string>")
        .select("doc_id", F.posexplode("toks").alias("pos", "tok"))
        .filter(F.col("tok").isin(*terms))
    )
    got = {
        r["doc_id"]: r["min_span"]
        for r in retrieval.min_cover_span(
            hits, "doc_id", "tok", "pos", terms
        ).collect()
    }

    def brute(toks):
        pos = [(i, t) for i, t in enumerate(toks) if t in terms]
        best = None
        for i, (pa, _) in enumerate(pos):
            need = set(terms)
            for pb, tb in pos[i:]:
                need.discard(tb)
                if not need:
                    span = pb - pa
                    best = span if best is None else min(best, span)
                    break
        return best

    want = {
        i: s
        for i, s in ((i, brute(toks)) for i, toks in rows)
        if s is not None
    }
    assert got == want


def test_compaction_advisor_zero_byte_guard(spark):
    """Degenerate-input parity (the ADVICE structural class): a source
    whose docs are all empty has files_needed = 0 — the ratio columns
    must be NULL via the explicit guard, not a division error (Spark
    ANSI raises on x div 0 where DuckDB yields NULL)."""
    from pyspark.sql import functions as F

    s = spark.createDataFrame(
        [("empty", 3, 0, 0), ("full", 2, 70000, 60000)],
        "source string, n_docs long, total_bytes long, max_doc_bytes long",
    )
    files = F.expr("(total_bytes + 65535) div 65536")
    out = {
        r["source"]: r
        for r in s.select(
            "source",
            files.alias("files_needed"),
            F.when(
                F.col("total_bytes") > 0,
                F.expr(
                    "(total_bytes * 100)"
                    " div (((total_bytes + 65535) div 65536) * 65536)"
                ),
            ).alias("fill_pct"),
            F.when(
                F.col("total_bytes") > 0,
                F.expr("n_docs div ((total_bytes + 65535) div 65536)"),
            ).alias("docs_per_file"),
        ).collect()
    }
    assert out["empty"]["files_needed"] == 0
    assert out["empty"]["fill_pct"] is None
    assert out["empty"]["docs_per_file"] is None
    assert out["full"]["files_needed"] == 2
    assert out["full"]["fill_pct"] == 53


def test_foreign_timezone_session_parity(spark, sf_dir):
    """The external driver passes its OWN SparkSession, possibly with a
    non-UTC session timezone; tables.load must pin UTC back so
    date-cast buckets (cohort days, RFM recency, decay ages) don't
    shift. Run the ts-dependent round-9 queries through a Tokyo-TZ
    sibling session and require row-identical results."""
    import __spark_entry__ as e

    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    qs = e.queries()
    for name in (
        "w34_cohort_ltv",
        "behavior_rfm_segments",
        "ext_decayed_counts",
        "behavior_path_trigrams",
    ):
        a = sorted(map(tuple, qs[name](spark, sf_dir).collect()))
        b = sorted(map(tuple, qs[name](s2, sf_dir).collect()))
        assert a == b, name
