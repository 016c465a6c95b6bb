"""Combined driver-window suites.

The external driver verifies only the FIRST 50 registered queries, so
near-duplicate single-operator demos are consolidated here into
multi-column suites grouped by source table — each suite demonstrates
several SURVEY.md §2 operators in one gate slot. The single-operator
originals stay registered (after the window) and pytest-verified; the
suites reuse the exact same library functions, so a green suite row is
a green row for every operator it carries.

Suite → operators:
  f2_f11_casualty_filename   F2, F11, F12       (orders)
  f8_f9_cleanup_url          F8, F9             (documents)
  f14_f17_label_json         F14, F17           (nation)
  f15_f19_p9_geometry        F15, F19, P9       (part)
  p4_p5_text_restructure     P4, P5             (documents)
  w1_w2_chunk_slice          W1, W2             (scenario corpus)
  w3_layout_suite            W3, W4, W5, W6, A4, A5
  scenario_profile           A6, P11
  s2_p6_worklist_route       S2, P6, O2(limit)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.functions import nested, scalar
from shippai_knowledge_etl_spark.operators import diagram
from shippai_knowledge_etl_spark.queries.nested import (
    _SCN_SQL,
    scenario_flat,
    scenario_source,
    scenario_struct,
)
from shippai_knowledge_etl_spark.tables import load


@register(
    "f2_f11_casualty_filename",
    survey_ref="F2 (src/extract.py:388-393) + F11/F12 (src/extract.py:417, "
    "src/run.py:96-97): casualty leading-int + filename build/parse roundtrip",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'negligible'
                  ELSE o_orderpriority END AS casualty_text,
             printf('CZ%07d', o_orderkey) || '_' ||
               replace(o_orderpriority, '-', '_') || '.json' AS filename
      FROM orders),
    parsed AS (
      SELECT *, regexp_replace(filename, '\\.json$', '') AS base FROM src)
    SELECT o_orderkey, casualty_text,
           coalesce(TRY_CAST(regexp_extract(casualty_text, '\\d+', 0) AS INT), 0) AS n,
           filename,
           substr(base, 1, strpos(base, '_') - 1) AS case_id,
           substr(base, strpos(base, '_') + 1) AS case_name
    FROM parsed
    """,
)
def f2_f11_casualty_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    text = F.when(F.col("o_orderkey") % 7 == 0, F.lit("negligible")).otherwise(
        F.col("o_orderpriority")
    )
    case_id = F.format_string("CZ%07d", F.col("o_orderkey"))
    case_name = F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_"))
    fname = scalar.output_filename(case_id, case_name, "json")
    base = F.regexp_replace(fname, r"\.json$", "")
    cid, cname = scalar.split_filename(base)
    return o.select(
        "o_orderkey",
        text.alias("casualty_text"),
        scalar.leading_int(text).alias("n"),
        fname.alias("filename"),
        cid.alias("case_id"),
        cname.alias("case_name"),
    )


@register(
    "f8_f9_cleanup_url",
    survey_ref="F8 (src/extract.py:257) + F9 (src/render_pdf.py:428-432): "
    "nbsp normalize + URL extraction",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             replace(substr(text, 1, 40), ' ', chr(160)) AS raw,
             CASE WHEN doc_id % 2 = 0
                  THEN 'see https://example.org/' || source || '/p?id=' || doc_id || ' for details'
                  ELSE 'no link here (' || source || ')' END AS source_text
      FROM documents)
    SELECT doc_id, replace(raw, chr(160), ' ') AS cleaned,
           regexp_extract(source_text, '(https?://\\S+)', 1) AS url
    FROM src
    """,
)
def f8_f9_cleanup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    raw = F.translate(F.substring("text", 1, 40), " ", " ")
    source_text = F.when(
        F.col("doc_id") % 2 == 0,
        F.format_string(
            "see https://example.org/%s/p?id=%d for details",
            F.col("source"),
            F.col("doc_id"),
        ),
    ).otherwise(F.format_string("no link here (%s)", F.col("source")))
    return d.select(
        "doc_id",
        scalar.normalize_nbsp(raw).alias("cleaned"),
        scalar.extract_url(source_text).alias("url"),
    )


@register(
    "f14_f17_label_json",
    survey_ref="F14 (src/render_pdf.py:249) + F17 (src/extract.py:421): "
    "numbered label + record-to-JSON",
    oracle="""
    SELECT n_nationkey,
           printf('%02d. %s',
                  CAST(row_number() OVER (ORDER BY n_name, n_nationkey) AS INT),
                  n_name) AS label,
           to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) AS js
    FROM nation
    """,
)
def f14_f17_label_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    num = F.row_number().over(Window.orderBy("n_name", "n_nationkey"))
    return n.select(
        "n_nationkey",
        scalar.numbered_label(num, F.col("n_name")).alias("label"),
        F.to_json(F.struct("n_nationkey", "n_name")).alias("js"),
    )


@register(
    "f15_f19_p9_geometry",
    survey_ref="F15 (src/render_pdf.py:107-110) + F19 (src/extract.py:330-340) "
    "+ P9 (src/extract.py:185-195,223): scale-to-fit, separator decode, "
    "basename/stem",
    oracle="""
    WITH dims AS (
      SELECT p_partkey, CAST(40 + p_size * 20 AS DOUBLE) AS w,
             CAST(30 + (p_partkey % 37) * 25 AS DOUBLE) AS h,
             15 + p_size * 20 AS sep_width,
             printf('../df/dir%d/img_%d.v2.jpg',
                    CAST(p_partkey % 7 AS INT), p_partkey) AS path
      FROM part WHERE p_size >= 1),
    r AS (SELECT *, least(480.0 / w, 360.0 / h) AS ratio FROM dims)
    SELECT p_partkey, w, h,
           CASE WHEN ratio >= 1 THEN w ELSE w * ratio END AS out_w,
           CASE WHEN ratio >= 1 THEN h ELSE h * ratio END AS out_h,
           sep_width,
           ((sep_width - 15) // 20 + 1) * 3 AS item_after,
           path,
           str_split(path, '/')[-1] AS base,
           regexp_extract(str_split(path, '/')[-1], '^(.*?)(?:\\.[^.]*)?$', 1) AS stem
    FROM r
    """,
)
def f15_f19_p9_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 1)
    w = (F.lit(40) + F.col("p_size") * 20).cast("double")
    h = (F.lit(30) + (F.col("p_partkey") % 37) * 25).cast("double")
    out_w, out_h = scalar.scale_to_fit(w, h, 480.0, 360.0)
    width = (F.lit(15) + F.col("p_size") * 20).cast("long")
    path = F.format_string(
        "../df/dir%d/img_%d.v2.jpg",
        (F.col("p_partkey") % 7).cast("int"),
        F.col("p_partkey"),
    )
    return p.select(
        "p_partkey",
        w.alias("w"),
        h.alias("h"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        width.alias("sep_width"),
        scalar.separator_item_after(width).alias("item_after"),
        path.alias("path"),
        scalar.basename(path).alias("base"),
        scalar.stem(path).alias("stem"),
    )


@register(
    "p4_p5_text_restructure",
    survey_ref="P4 (src/extract.py:100-107) + P5 (src/extract.py:109-130): "
    "br-to-newline + paragraph re-segmentation",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             '  ' || replace(substr(text, 1, 60), ' ', '<br>') || '<BR/>' AS html,
             chr(10) || ' ' || replace(replace(substr(text, 1, 80),
               ' table ', chr(10) || chr(10) || '   ' || chr(10) || 'table '),
               ' the ', ' ' || chr(10) || 'the ') || '  ' || chr(10) AS raw
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(html, '(?i)<br\\s*/?>', chr(10), 'g'),
                          '^\\s+|\\s+$', '', 'g') AS plain,
           regexp_replace(regexp_replace(regexp_replace(raw,
             '(?m)^[ \\t]+|[ \\t]+$', '', 'g'),
             '\\n{2,}', chr(10) || chr(10), 'g'),
             '^\\n+|\\n+$', '', 'g') AS paragraphs
    FROM src
    """,
)
def p4_p5_text_restructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("  "),
        F.replace(F.substring("text", 1, 60), F.lit(" "), F.lit("<br>")),
        F.lit("<BR/>"),
    )
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
    return d.select(
        "doc_id",
        scalar.br_to_newline(html).alias("plain"),
        scalar.paragraphs(raw).alias("paragraphs"),
    )


@register(
    "w1_w2_chunk_slice",
    survey_ref="W1 (src/extract.py:370-371) + W2 (src/extract.py:350-367): "
    "per-item chunk index + boundary-slice category/position",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(ord - 1 AS INT) AS idx0, item,
           CAST((ord - 1) // 3 AS INT) AS grp_idx,
           category,
           CAST(ord - 1 - CASE category WHEN 'cause' THEN 0
                               WHEN 'action' THEN 3
                               ELSE CASE WHEN n_doubles >= 2 THEN 6 ELSE 3 END
                          END AS INT) AS pos
    FROM cat
    """,
)
def w1_w2_chunk_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per item carrying BOTH structure facts: the W1 chunk-by-3
    group index and the W2 boundary-slice (category, in-category pos).
    concat(cause, action, result) restores original order, so the global
    posexplode index doubles as the W1 numerator."""
    src = scenario_source(spark, sf_dir)
    cats = nested.slice_categories(F.col("items"), F.col("boundaries"))

    def tagged(cat: str):
        return F.transform(
            cats.getField(cat),
            lambda x, i: F.struct(
                F.lit(cat).alias("category"), i.alias("pos"), x.alias("item")
            ),
        )

    rows = F.concat(tagged("cause"), tagged("action"), tagged("result"))
    return (
        src.select("doc_id", F.posexplode(rows).alias("idx0", "r"))
        .select(
            "doc_id",
            F.col("idx0").cast("int"),
            "r.item",
            # structural integer div matching the oracle's `// 3`
            # (r9 parity sweep): the prior floor(double/3) form was
            # provably equal for these small nonneg indices but ran a
            # DIFFERENT op than the oracle — the q12 class of seam
            F.expr("idx0 div 3").cast("int").alias("grp_idx"),
            "r.category",
            F.col("r.pos").cast("int").alias("pos"),
        )
    )


@register(
    "w3_layout_suite",
    survey_ref="W3 (src/render_pdf.py:149-172) + W4/A4 (:176-201) + W5 "
    "(:217-227) + W6/A5 (:257-269): flatten-renumber, separator markers, "
    "y positions, category ranges — one row per item",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(i AS INT) AS idx0, CAST(i + 1 AS INT) AS num,
           item AS text, category,
           CAST(cn AS INT) AS cause_count, CAST(ae AS INT) AS action_end,
           CAST(n_real AS INT) AS total_items,
           line_type,
           CAST(y AS BIGINT) AS y, CAST(total_h AS BIGINT) AS total_h,
           CAST(min(i) OVER wc AS INT) AS first_idx,
           CAST(max(i) OVER wc AS INT) AS last_idx,
           CAST((min(i) OVER wc + max(i) OVER wc) // 2 AS INT) AS mid_idx
    FROM ypos
    WINDOW wc AS (PARTITION BY doc_id, category)
    """,
)
def w3_layout_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole per-item layout pipeline in one result: global
    renumbering (W3), separator line type (W4, doubles override singles,
    last item bare), data-dependent running y and canvas height (W5/A4),
    and per-category first/mid/last (W6/A5) via windows — all from the
    fused zero-shuffle ``positioned_items`` plan."""
    pos = diagram.positioned_items_chunked(
        scenario_flat(scenario_source(spark, sf_dir)),
        "doc_id", "__cats", nested=False,
    )
    line_type = (
        F.when(F.array_contains("doubles", F.col("idx0")), F.lit("double"))
        .when(F.array_contains("singles", F.col("idx0")), F.lit("single"))
    )
    wc = Window.partitionBy("doc_id", "category")
    first_idx = F.min("idx0").over(wc)
    last_idx = F.max("idx0").over(wc)
    return pos.select(
        "doc_id",
        F.col("idx0").cast("int"),
        F.col("num").cast("int"),
        "text",
        "category",
        F.col("cause_count").cast("int"),
        F.col("action_end").cast("int"),
        F.col("total_items").cast("int"),
        line_type.alias("line_type"),
        F.col("y").cast("long").alias("y"),
        F.col("total_h").cast("long").alias("total_h"),
        first_idx.cast("int").alias("first_idx"),
        last_idx.cast("int").alias("last_idx"),
        F.floor((first_idx + last_idx) / 2).cast("int").alias("mid_idx"),
    )


@register(
    "scenario_profile",
    survey_ref="A6 (src/extract.py:344,352-367) + P11 (src/extract.py:266-269): "
    "boundary-set analysis + scenario presence per case",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id,
           CAST(to_json(CASE WHEN n_doubles >= 2 THEN [3, 6]
                WHEN n_doubles = 1 THEN [3]
                ELSE CAST([] AS INT[]) END) AS VARCHAR) AS boundaries,
           CAST(least(n_doubles, 2) AS INT) AS n_boundaries,
           CASE WHEN n_doubles >= 1 THEN 3 END AS b1,
           CASE WHEN n_doubles >= 2 THEN 6 END AS b2,
           (doc_id % 10 <> 0) AS has_scenario
    FROM tok
    """,
)
def scenario_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-case profile: sorted boundary set (A6, to_json'd for the
    gate) + presence through the real chunking path with every 10th
    case's items emptied (P11)."""
    src = scenario_source(spark, sf_dir).withColumn(
        "items",
        F.when(F.col("doc_id") % 10 == 0, F.expr("CAST(array() AS ARRAY<STRING>)"))
        .otherwise(F.col("items")),
    )
    df = scenario_struct(src)
    b = F.array_sort("boundaries")
    return df.select(
        "doc_id",
        F.to_json(b).alias("boundaries"),
        F.size(b).cast("int").alias("n_boundaries"),
        F.get(b, 0).alias("b1"),
        F.get(b, 1).alias("b2"),
        nested.scenario_presence(F.col("scenario")).alias("has_scenario"),
    )


@register(
    "s2_p6_worklist_route",
    survey_ref="S2 (src/extract.py:396-407) + P6 (src/run.py:66-77): list-page "
    "expansion with limit pushdown, then /lis/ vs /cf/ vs skip routing",
    oracle="""
    WITH lists AS (
      SELECT n_nationkey AS list_id, 3 + n_nationkey % 5 AS n_links FROM nation),
    expanded AS (
      SELECT list_id, CAST(i AS INT) AS pos,
             CASE WHEN i % 3 = 0
                    THEN 'https://www.shippai.org/fkd/lis/hyaku_lis.html'
                  WHEN i % 3 = 1
                    THEN printf('https://other.example.org/p%d_%d',
                                list_id, CAST(i AS INT))
                  ELSE printf('https://www.shippai.org/fkd/cf/CZ%d_%d.html',
                              list_id, CAST(i AS INT)) END AS case_url
      FROM lists, LATERAL unnest(range(0, n_links)) AS t(i))
    SELECT list_id, pos, case_url,
           CASE WHEN case_url LIKE '%/lis/%' THEN 'expand'
                WHEN case_url LIKE '%/cf/%' THEN 'direct'
                ELSE 'skip' END AS route
    FROM expanded WHERE pos < 4
    """,
)
def s2_p6_worklist_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worklist pipeline: expand each list page into case URLs (limit
    pushed to the exploded position) and route each URL the way the
    reference's if/elif chain does — mixed URL shapes exercise all
    three branches."""
    n = load(spark, sf_dir, "nation")
    links = F.transform(
        F.sequence(F.lit(0), F.lit(2) + F.col("n_nationkey") % 5),
        lambda i: F.when(
            i % 3 == 0, F.lit("https://www.shippai.org/fkd/lis/hyaku_lis.html")
        )
        .when(
            i % 3 == 1,
            F.format_string(
                "https://other.example.org/p%d_%d",
                F.col("n_nationkey"),
                i.cast("int"),
            ),
        )
        .otherwise(
            F.format_string(
                "https://www.shippai.org/fkd/cf/CZ%d_%d.html",
                F.col("n_nationkey"),
                i.cast("int"),
            )
        ),
    )
    return (
        n.select(
            F.col("n_nationkey").alias("list_id"),
            F.posexplode(links).alias("pos", "case_url"),
        )
        .filter(F.col("pos") < 4)
        .select(
            "list_id",
            F.col("pos").cast("int"),
            "case_url",
            F.when(F.col("case_url").contains("/lis/"), F.lit("expand"))
            .when(F.col("case_url").contains("/cf/"), F.lit("direct"))
            .otherwise(F.lit("skip"))
            .alias("route"),
        )
    )
