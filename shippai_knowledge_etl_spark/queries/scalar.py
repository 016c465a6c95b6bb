"""Scalar-function demonstrations (F1–F19, P1/P4/P5/P9 of SURVEY.md §2).

Each query synthesizes its input deterministically FROM the driver's
tables (both Spark and the DuckDB oracle build the identical input
expression), then applies the engine function. For the fold-based list
parsers the oracle computes the expected output directly from the
construction — a ground-truth check, not an implementation mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.functions import listparse, scalar
from shippai_knowledge_etl_spark.tables import load


@register(
    "f1_date_normalize",
    survey_ref="F1 (src/extract.py:380-385)",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 5 = 0 THEN 'not a date: ' || o_orderpriority
                  ELSE printf('%d年%d月%d日', year(o_orderdate),
                              month(o_orderdate), day(o_orderdate))
             END AS raw
      FROM orders)
    SELECT o_orderkey, raw,
           CASE WHEN regexp_matches(raw, '(\\d{4})年(\\d{1,2})月(\\d{1,2})日')
                THEN printf('%s-%02d-%02d',
                            regexp_extract(raw, '(\\d{4})年(\\d{1,2})月(\\d{1,2})日', 1),
                            CAST(regexp_extract(raw, '(\\d{4})年(\\d{1,2})月(\\d{1,2})日', 2) AS INT),
                            CAST(regexp_extract(raw, '(\\d{4})年(\\d{1,2})月(\\d{1,2})日', 3) AS INT))
                ELSE raw END AS date_str,
           CASE WHEN o_orderkey % 5 <> 0 THEN CAST(o_orderdate AS DATE) END AS date
    FROM src
    """,
)
def f1_date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Japanese dates round-tripped from o_orderdate, with a garbage
    branch exercising the passthrough, plus the typed DATE companion."""
    o = load(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderkey") % 5 == 0,
        F.concat(F.lit("not a date: "), F.col("o_orderpriority")),
    ).otherwise(
        F.format_string(
            "%d年%d月%d日",
            F.year("o_orderdate"),
            F.month("o_orderdate"),
            F.dayofmonth("o_orderdate"),
        )
    )
    return o.select("o_orderkey", raw.alias("raw")).select(
        "o_orderkey",
        "raw",
        scalar.normalize_jp_date(F.col("raw")).alias("date_str"),
        scalar.try_date(F.col("raw")).alias("date"),
    )


@register(
    "f2_leading_int",
    survey_ref="F2 (src/extract.py:388-393)",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'negligible'
                  ELSE o_orderpriority END AS casualty_text
      FROM orders)
    SELECT o_orderkey, casualty_text,
           coalesce(TRY_CAST(regexp_extract(casualty_text, '\\d+', 0) AS INT), 0) AS n
    FROM src
    """,
)
def f2_leading_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    text = F.when(F.col("o_orderkey") % 7 == 0, F.lit("negligible")).otherwise(
        F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        text.alias("casualty_text"),
        scalar.leading_int(text).alias("n"),
    )


@register(
    "f6_knowledge_parse",
    survey_ref="F3-F6 (src/extract.py:149-180): multi-format list parse",
    oracle="""
    -- The oracle computes the EXPECTED parse from the construction:
    --  m=0 bullets with a continuation line -> [t1, t2||t3]
    --  m=1 numbered (full-width for even doc_id) with continuation -> [t1||t2, t3]
    --  m=2 plain text -> [whole text]
    WITH tok AS (
      SELECT doc_id, doc_id % 3 AS m,
             str_split(text, ' ')[1] AS t1,
             str_split(text, ' ')[2] AS t2,
             str_split(text, ' ')[3] AS t3
      FROM documents)
    SELECT doc_id,
           CASE WHEN m = 0 THEN '・' || t1 || chr(10) || '・' || t2 || chr(10) || t3
                WHEN m = 1 THEN
                  CASE WHEN doc_id % 2 = 0
                       THEN '１．' || t1 || chr(10) || t2 || chr(10) || '２．' || t3
                       ELSE '1. ' || t1 || chr(10) || t2 || chr(10) || '2. ' || t3 END
                ELSE t1 || ' ' || t2 || ' ' || t3 END AS knowledge_text,
           CAST(to_json(CASE WHEN m = 0 THEN [t1, t2 || t3]
                WHEN m = 1 THEN [t1 || t2, t3]
                ELSE [t1 || ' ' || t2 || ' ' || t3] END) AS VARCHAR) AS items
    FROM tok
    """,
)
def f6_knowledge_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knowledge-field parse in all three reference formats, including
    full-width numbering and continuation-line merging. The Spark side
    runs the real fold (HOF aggregate); the oracle states the expected
    items directly."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        (F.col("doc_id") % 3).alias("m"),
        F.split("text", " ").getItem(0).alias("t1"),
        F.split("text", " ").getItem(1).alias("t2"),
        F.split("text", " ").getItem(2).alias("t3"),
    )
    nl = F.lit("\n")
    bullet = F.concat(
        F.lit("・"), F.col("t1"), nl, F.lit("・"), F.col("t2"), nl, F.col("t3")
    )
    numbered = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("１．"), F.col("t1"), nl, F.col("t2"), nl, F.lit("２．"), F.col("t3")
        ),
    ).otherwise(
        F.concat(
            F.lit("1. "), F.col("t1"), nl, F.col("t2"), nl, F.lit("2. "), F.col("t3")
        )
    )
    plain = F.concat_ws(" ", "t1", "t2", "t3")
    text = (
        F.when(F.col("m") == 0, bullet)
        .when(F.col("m") == 1, numbered)
        .otherwise(plain)
    )
    return tok.select(
        "doc_id",
        text.alias("knowledge_text"),
        # gate boundary: to_json the parsed array (driver can't hash lists)
        F.to_json(listparse.parse_knowledge(text)).alias("items"),
    )


@register(
    "f7_split_nonblank",
    survey_ref="F7 (src/extract.py:230-237,254-260)",
    oracle="""
    SELECT doc_id,
           CAST(to_json(list_filter(list_transform(str_split(text, ' '), x -> trim(x)),
                       x -> x <> '')) AS VARCHAR) AS parts,
           len(list_filter(list_transform(str_split(text, ' '), x -> trim(x)),
                           x -> x <> '')) AS n_parts
    FROM documents
    """,
)
def f7_split_nonblank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    parts = scalar.split_nonblank(F.col("text"), " ")
    return d.select(
        "doc_id", F.to_json(parts).alias("parts"), F.size(parts).alias("n_parts")
    )


@register(
    "f8_nbsp_normalize",
    survey_ref="F8 (src/extract.py:257)",
    oracle="""
    WITH src AS (SELECT doc_id, replace(substr(text, 1, 40), ' ', chr(160)) AS raw
                 FROM documents)
    SELECT doc_id, replace(raw, chr(160), ' ') AS cleaned FROM src
    """,
)
def f8_nbsp_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    raw = F.translate(F.substring("text", 1, 40), " ", " ")
    return d.select("doc_id", scalar.normalize_nbsp(raw).alias("cleaned"))


@register(
    "f9_url_extract",
    survey_ref="F9 (src/render_pdf.py:428-432)",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 'see https://example.org/' || source || '/p?id=' || doc_id || ' for details'
                  ELSE 'no link here (' || source || ')' END AS source_text
      FROM documents)
    SELECT doc_id, regexp_extract(source_text, '(https?://\\S+)', 1) AS url
    FROM src
    """,
)
def f9_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    text = F.when(
        F.col("doc_id") % 2 == 0,
        F.format_string(
            "see https://example.org/%s/p?id=%d for details",
            F.col("source"),
            F.col("doc_id"),
        ),
    ).otherwise(F.format_string("no link here (%s)", F.col("source")))
    return d.select("doc_id", scalar.extract_url(text).alias("url"))


@register(
    "f11_f12_filename_roundtrip",
    survey_ref="F10-F12 (src/extract.py:417, src/run.py:96-97)",
    oracle="""
    WITH named AS (
      SELECT o_orderkey,
             printf('CZ%07d', o_orderkey) || '_' ||
               replace(o_orderpriority, '-', '_') || '.json' AS filename
      FROM orders),
    parsed AS (
      SELECT o_orderkey, filename,
             regexp_replace(filename, '\\.json$', '') AS base
      FROM named)
    SELECT o_orderkey, filename,
           substr(base, 1, strpos(base, '_') - 1) AS case_id,
           substr(base, strpos(base, '_') + 1) AS case_name
    FROM parsed
    """,
)
def f11_f12_filename_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build `{case_id}_{case_name}.json` then parse it back with a
    limit-2 split — underscores inside case_name survive."""
    o = load(spark, sf_dir, "orders")
    case_id = F.format_string("CZ%07d", F.col("o_orderkey"))
    case_name = F.replace(
        F.col("o_orderpriority"), F.lit("-"), F.lit("_")
    )
    fname = scalar.output_filename(case_id, case_name, "json")
    base = F.regexp_replace(fname, r"\.json$", "")
    cid, cname = scalar.split_filename(base)
    return o.select(
        "o_orderkey",
        fname.alias("filename"),
        cid.alias("case_id"),
        cname.alias("case_name"),
    )


@register(
    "f13_results_sequence",
    survey_ref="F13/A2 (src/run.py:135-142)",
    oracle="""
    WITH files AS (
      SELECT CASE WHEN event_id % 11 = 0 THEN 'summary.txt'
                  ELSE printf('results_%03d.json', CAST(event_id % 97 AS INT)) END AS fname
      FROM events)
    SELECT coalesce(max(TRY_CAST(regexp_extract(fname, 'results_(\\d+)\\.json$', 1) AS INT)), 0) AS max_seq,
           printf('results_%03d.json',
                  coalesce(max(TRY_CAST(regexp_extract(fname, 'results_(\\d+)\\.json$', 1) AS INT)), 0) + 1) AS next_name
    FROM files
    """,
)
def f13_results_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max+1 manifest numbering: the driver-side single-writer sequence
    (SURVEY §7.4 item 4) — a one-row global agg, never in executors."""
    e = load(spark, sf_dir, "events")
    fname = F.when(F.col("event_id") % 11 == 0, F.lit("summary.txt")).otherwise(
        F.format_string("results_%03d.json", (F.col("event_id") % 97).cast("int"))
    )
    seq = scalar.results_seq_no(fname)
    return e.select(seq.alias("seq")).agg(
        F.coalesce(F.max("seq"), F.lit(0)).alias("max_seq")
    ).select(
        "max_seq",
        F.format_string("results_%03d.json", F.col("max_seq") + 1).alias("next_name"),
    )


@register(
    "f14_numbered_label",
    survey_ref="F14 (src/render_pdf.py:249)",
    oracle="""
    SELECT n_nationkey,
           printf('%02d. %s',
                  CAST(row_number() OVER (ORDER BY n_name, n_nationkey) AS INT),
                  n_name) AS label
    FROM nation
    """,
)
def f14_numbered_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n = load(spark, sf_dir, "nation")
    # global (unpartitioned) window is intentional: F14 numbers one
    # bounded per-report list — nation is a fixed-size dim, so the
    # SinglePartition exchange moves 25 rows at any corpus scale
    # (allowlisted in tests/test_plan_invariants.py)
    num = F.row_number().over(Window.orderBy("n_name", "n_nationkey"))
    return n.select(
        "n_nationkey", scalar.numbered_label(num, F.col("n_name")).alias("label")
    )


@register(
    "f15_scale_to_fit",
    survey_ref="F15 (src/render_pdf.py:107-110,308-311)",
    oracle="""
    WITH dims AS (
      SELECT p_partkey, CAST(40 + p_size * 20 AS DOUBLE) AS w,
             CAST(30 + (p_partkey % 37) * 25 AS DOUBLE) AS h
      FROM part),
    r AS (SELECT *, least(480.0 / w, 360.0 / h) AS ratio FROM dims)
    SELECT p_partkey, w, h,
           CASE WHEN ratio >= 1 THEN w ELSE w * ratio END AS out_w,
           CASE WHEN ratio >= 1 THEN h ELSE h * ratio END AS out_h
    FROM r
    """,
)
def f15_scale_to_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = (F.lit(40) + F.col("p_size") * 20).cast("double")
    h = (F.lit(30) + (F.col("p_partkey") % 37) * 25).cast("double")
    out_w, out_h = scalar.scale_to_fit(w, h, 480.0, 360.0)
    return p.select(
        "p_partkey", w.alias("w"), h.alias("h"),
        out_w.alias("out_w"), out_h.alias("out_h"),
    )


@register(
    "f17_to_json",
    survey_ref="F17 (src/extract.py:421, src/run.py:145)",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS js
    FROM nation
    """,
)
def f17_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name")).alias("js"),
    )


@register(
    "f18_json_extract",
    survey_ref="F18 (src/render_pdf.py:477-478); events.props demo",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k,
           CAST(props->>'$.k' AS INT) % 10 AS k_mod
    FROM events
    """,
)
def f18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both json paths and schema-typed from_json over events.props."""
    e = load(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("int")
    k_schema = F.from_json("props", "k INT").getField("k")
    return e.select(
        "event_id",
        F.coalesce(k_path, k_schema).alias("k"),
        (k_schema % 10).alias("k_mod"),
    )


@register(
    "f19_separator_decode",
    survey_ref="F19 (src/extract.py:330-331,339-340)",
    oracle="""
    SELECT p_partkey, 15 + p_size * 20 AS sep_width,
           ((15 + p_size * 20 - 15) // 20 + 1) * 3 AS item_after
    FROM part WHERE p_size >= 1
    """,
)
def f19_separator_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 1)
    width = (F.lit(15) + F.col("p_size") * 20).cast("long")
    return p.select(
        "p_partkey",
        width.alias("sep_width"),
        scalar.separator_item_after(width).alias("item_after"),
    )


@register(
    "p1_case_id_extract",
    survey_ref="P1 (src/extract.py:41-46)",
    oracle="""
    WITH urls AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 9 = 0
                  THEN 'https://www.shippai.org/fkd/lis/hyaku_lis.html'
                  ELSE printf('https://www.shippai.org/fkd/cf/CZ%07d.html', o_orderkey)
             END AS url
      FROM orders)
    SELECT o_orderkey, url,
           regexp_extract(url, '/cf/(\\w+)\\.html', 1) AS case_id,
           regexp_extract(url, '/cf/(\\w+)\\.html', 1) = '' AS is_invalid
    FROM urls
    """,
)
def p1_case_id_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-id regex with the error branch as a boolean validation
    column instead of an exception (design rule §7.0-3)."""
    o = load(spark, sf_dir, "orders")
    url = F.when(
        F.col("o_orderkey") % 9 == 0,
        F.lit("https://www.shippai.org/fkd/lis/hyaku_lis.html"),
    ).otherwise(
        F.format_string("https://www.shippai.org/fkd/cf/CZ%07d.html", F.col("o_orderkey"))
    )
    cid = scalar.case_id_from_url(url)
    return o.select(
        "o_orderkey", url.alias("url"), cid.alias("case_id"),
        (cid == "").alias("is_invalid"),
    )


@register(
    "p4_br_to_newline",
    survey_ref="P4 (src/extract.py:100-107)",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             '  ' || replace(substr(text, 1, 60), ' ', '<br>') || '<BR/>' AS html
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(html, '(?i)<br\\s*/?>', chr(10), 'g'),
                          '^\\s+|\\s+$', '', 'g') AS plain
    FROM src
    """,
)
def p4_br_to_newline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("  "),
        F.replace(F.substring("text", 1, 60), F.lit(" "), F.lit("<br>")),
        F.lit("<BR/>"),
    )
    return d.select("doc_id", scalar.br_to_newline(html).alias("plain"))


@register(
    "p5_paragraphs",
    survey_ref="P5 (src/extract.py:109-130)",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             chr(10) || ' ' || replace(replace(substr(text, 1, 80),
               ' table ', chr(10) || chr(10) || '   ' || chr(10) || 'table '),
               ' the ', ' ' || chr(10) || 'the ') || '  ' || chr(10) AS raw
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(raw,
             '(?m)^[ \\t]+|[ \\t]+$', '', 'g'),
             '\\n{2,}', chr(10) || chr(10), 'g'),
             '^\\n+|\\n+$', '', 'g') AS paragraphs
    FROM src
    """,
)
def p5_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph re-segmentation over text with injected blank-line runs
    and stray indentation (mirrors get_html_text's cleanup)."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("\n "),
        F.replace(
            F.replace(
                F.substring("text", 1, 80),
                F.lit(" table "),
                F.lit("\n\n   \ntable "),
            ),
            F.lit(" the "),
            F.lit(" \nthe "),
        ),
        F.lit("  \n"),
    )
    return d.select("doc_id", scalar.paragraphs(raw).alias("paragraphs"))


@register(
    "p9_basename_stem",
    survey_ref="P9 (src/extract.py:185-195,223)",
    oracle="""
    WITH paths AS (
      SELECT p_partkey, printf('../df/dir%d/img_%d.v2.jpg', CAST(p_partkey % 7 AS INT), p_partkey) AS path
      FROM part)
    SELECT p_partkey, path,
           str_split(path, '/')[-1] AS base,
           regexp_extract(str_split(path, '/')[-1], '^(.*?)(?:\\.[^.]*)?$', 1) AS stem
    FROM paths
    """,
)
def p9_basename_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    path = F.format_string(
        "../df/dir%d/img_%d.v2.jpg", (F.col("p_partkey") % 7).cast("int"), F.col("p_partkey")
    )
    return p.select(
        "p_partkey",
        path.alias("path"),
        scalar.basename(path).alias("base"),
        scalar.stem(path).alias("stem"),
    )


@register(
    "f16_run_timestamp",
    survey_ref="F16 (src/run.py:125) — nondeterministic, rows-only check",
)
def f16_run_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.agg(F.count(F.lit(1)).alias("n")).select(
        "n", scalar.iso_now().alias("processed_at")
    )
