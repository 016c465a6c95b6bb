"""Nested-array restructuring & layout-math demonstrations
(SURVEY.md §2.8 W1–W7, §2.5 O1/O3, §2.4 A4–A6, §2.2 P3/P6–P8/P11).

A deterministic scenario corpus is synthesized from ``documents``:
  n_items   = 4 + doc_id % 9           (4..12 items per case)
  items     = first n_items tokens of text
  n_doubles = doc_id % 3               (2 / 1 / 0 double boundaries,
                                        exercising all three branches of
                                        src/extract.py:352-367)
  boundaries = [3,6] / [3] / []        (reference boundaries are always
                                        multiples of 3, src/extract.py:331)
Both the Spark source and every DuckDB oracle build this identical
corpus; oracles then state expected values independently (position
arithmetic), not by mirroring the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.functions import nested, scalar
from shippai_knowledge_etl_spark.operators import diagram
from shippai_knowledge_etl_spark.tables import load, scale_out

# Shared oracle CTEs (DuckDB). `cat` assigns each 1-based ord its
# category per the three boundary branches; `marks` adds the flat-case-
# aware category-end scalars cn (cause_count) / ae (action_end).
_SCN_SQL = """
    tok AS (
      SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS n_items,
             CAST(doc_id % 3 AS INT) AS n_doubles,
             list_slice(str_split(text, ' '), 1, CAST(4 + doc_id % 9 AS INT)) AS items
      FROM documents),
    tok2 AS (
      -- short texts yield fewer than n_items tokens; every downstream
      -- scalar must use the ACTUAL count
      SELECT *, CAST(len(items) AS INT) AS n_real FROM tok),
    exploded AS (
      SELECT doc_id, n_items, n_doubles, n_real,
             unnest(items) AS item,
             CAST(generate_subscripts(items, 1) AS INT) AS ord
      FROM tok2),
    cat AS (
      SELECT *,
             CASE WHEN n_doubles >= 2 THEN
                    CASE WHEN ord <= 3 THEN 'cause'
                         WHEN ord <= 6 THEN 'action' ELSE 'result' END
                  WHEN n_doubles = 1 THEN
                    CASE WHEN ord <= 3 THEN 'cause' ELSE 'result' END
                  ELSE 'cause' END AS category
      FROM exploded),
    marks AS (
      SELECT *,
             CASE WHEN n_doubles >= 1 THEN least(3, n_real) ELSE n_real END AS cn,
             CASE WHEN n_doubles >= 2 THEN least(6, n_real)
                  WHEN n_doubles = 1 THEN least(3, n_real)
                  ELSE n_real END AS ae
      FROM cat),
    cls AS (
      SELECT doc_id, n_doubles, n_real, ord - 1 AS i, item, category, cn, ae,
             CASE category WHEN 'cause' THEN 0 WHEN 'action' THEN cn ELSE ae END AS seg_start,
             CASE category WHEN 'cause' THEN cn - 1 WHEN 'action' THEN ae - 1
                  ELSE n_real - 1 END AS seg_end
      FROM marks),
    typed AS (
      SELECT doc_id, n_real, i, item, category, cn, ae,
             (i = cn - 1 AND cn > 0) OR (i = ae - 1 AND ae > cn) AS is_double,
             ((i - seg_start + 1) % 3 = 0 OR i = seg_end) AS is_group_end
      FROM cls),
    lined AS (
      SELECT *,
             CASE WHEN is_double THEN 'double'
                  WHEN is_group_end AND i <> n_real - 1 THEN 'single'
             END AS line_type
      FROM typed),
    extras AS (
      SELECT *,
             CASE line_type WHEN 'double' THEN 50 WHEN 'single' THEN 30 ELSE 0 END AS extra
      FROM lined),
    ypos AS (
      SELECT *,
             80 + i * 72 + coalesce(sum(extra) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS y,
             80 + n_real * 72 + sum(extra) OVER (PARTITION BY doc_id) + 50 AS total_h
      FROM extras)
"""


def scenario_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized scenario corpus (see module docstring).

    scale_out matters here: the corpus feeds the diagram layer's fused
    HOF expressions, whose cost is per-row compute, and the local
    single-file parquet scans as ONE split — without the conditional
    repartition every downstream narrow stage runs on 1 of 32 cores
    (measured: diagram_rects 1.8 s on one task vs ~0.4 s spread). On a
    real multi-split layout this is a no-op."""
    d = scale_out(load(spark, sf_dir, "documents"))
    n_items = (F.lit(4) + F.col("doc_id") % 9).cast("int")
    n_doubles = (F.col("doc_id") % 3).cast("int")
    items = F.slice(F.split("text", " "), 1, n_items)
    boundaries = (
        F.when(n_doubles >= 2, F.array(F.lit(3), F.lit(6)))
        .when(n_doubles == 1, F.array(F.lit(3)))
        .otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    )
    return d.select(
        "doc_id",
        n_items.alias("n_items"),
        n_doubles.alias("n_doubles"),
        items.alias("items"),
        boundaries.alias("boundaries"),
    )


def scenario_struct(src: DataFrame) -> DataFrame:
    """items+boundaries → the reference's nested scenario value:
    W2 boundary slicing then W1 chunk-by-3 per category."""
    cats = nested.slice_categories(F.col("items"), F.col("boundaries"))
    return src.withColumn(
        "scenario",
        F.struct(
            nested.chunk(cats.getField("cause")).alias("cause"),
            nested.chunk(cats.getField("action")).alias("action"),
            nested.chunk(cats.getField("result")).alias("result"),
        ),
    )


def scenario_flat(src: DataFrame) -> DataFrame:
    """items+boundaries → FLAT (cause, action, result) string arrays:
    W2 boundary slicing only, W1 chunking skipped. Feed to
    ``positioned_items_chunked(..., nested=False)``: chunk-by-3 is
    arithmetic there, so flatten(chunk(x)) == x lets the layout read
    the flat arrays directly — and slice_categories is lambda-free,
    which makes the whole scenario→layout pipeline codegen'd with zero
    interpreted HOFs (chunk's ``transform`` was the last one)."""
    cats = nested.slice_categories(F.col("items"), F.col("boundaries"))
    return src.select("doc_id", cats.alias("__cats"))


@register(
    "w1_chunk3",
    survey_ref="W1 (src/extract.py:370-371; requirements.md:144)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST((ord - 1) // 3 AS INT) AS grp_idx,
           CAST(to_json(array_agg(item ORDER BY ord)) AS VARCHAR) AS grp
    FROM exploded GROUP BY doc_id, (ord - 1) // 3
    """,
)
def w1_chunk3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Output arrays are serialized with to_json at the gate boundary: the
    # driver's pandas canonicalizer cannot hash list cells. Arrays stay
    # arrays internally (nested.chunk); only the final select stringifies.
    src = scenario_source(spark, sf_dir)
    return src.select(
        "doc_id", F.posexplode(nested.chunk(F.col("items"))).alias("grp_idx", "grp")
    ).withColumn("grp", F.to_json("grp"))


@register(
    "w2_boundary_slice",
    survey_ref="W2 (src/extract.py:350-367): 2/1/0-boundary branches",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, category,
           CAST(ord - 1 - CASE category WHEN 'cause' THEN 0
                               WHEN 'action' THEN 3
                               ELSE CASE WHEN n_doubles >= 2 THEN 6 ELSE 3 END
                          END AS INT) AS pos,
           item
    FROM cat
    """,
)
def w2_boundary_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return src.select("doc_id", F.explode(rows).alias("r")).select(
        "doc_id", "r.category", "r.pos", "r.item"
    )


@register(
    "o1_sort_by_num",
    survey_ref="O1 (src/extract.py:347-348)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id,
           CAST(to_json(array_agg(item ORDER BY ((ord - 1) * 13) % n_items))
                AS VARCHAR) AS sorted_items
    FROM exploded GROUP BY doc_id
    """,
)
def o1_sort_by_num(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items arrive with shuffled ordinals ((pos*13) mod n is a
    permutation since 13 is coprime to n≤12); sorting by num must
    recover a deterministic order. Output array is to_json'd for the
    driver gate (pandas canonicalizer can't hash lists)."""
    src = scenario_source(spark, sf_dir)
    structs = F.transform(
        F.col("items"),
        lambda x, i: F.struct(
            ((i * 13) % F.col("n_items")).alias("num"), x.alias("text")
        ),
    )
    return src.select(
        "doc_id",
        F.to_json(nested.sort_items_by_num(structs)).alias("sorted_items"),
    )


@register(
    "w3_flatten_renumber",
    survey_ref="W3 (src/render_pdf.py:149-172)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(i AS INT) AS idx0, CAST(i + 1 AS INT) AS num,
           item AS text, category,
           cn AS cause_count, ae AS action_end, n_real AS total_items
    FROM cls
    """,
)
def w3_flatten_renumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested groups → flat globally renumbered items. Validates the
    chunk/slice/flatten round-trip: flatten(chunk3(slice(x))) == x."""
    df = scenario_struct(scenario_source(spark, sf_dir))
    out = diagram.flatten_renumber(df, "doc_id")
    return out.select(
        "doc_id",
        F.col("idx0").cast("int"),
        F.col("num").cast("int"),
        "text",
        "category",
        F.col("cause_count").cast("int"),
        F.col("action_end").cast("int"),
        F.col("total_items").cast("int").alias("total_items"),
    )


@register(
    "w4_boundary_markers",
    survey_ref="W4/A4/U4 (src/render_pdf.py:176-201)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(i AS INT) AS idx, line_type
    FROM lined WHERE line_type IS NOT NULL
    """,
)
def w4_boundary_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = scenario_struct(scenario_source(spark, sf_dir))
    m = diagram.boundary_markers(df, "doc_id")
    singles = m.select(
        "doc_id", F.explode("singles").alias("idx"), F.lit("single").alias("line_type")
    )
    doubles = m.select(
        "doc_id", F.explode("doubles").alias("idx"), F.lit("double").alias("line_type")
    )
    return singles.unionByName(doubles).select(
        "doc_id", F.col("idx").cast("int"), "line_type"
    )


@register(
    "w5_y_positions",
    survey_ref="W5 (src/render_pdf.py:217-227): data-dependent cumsum",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(i AS INT) AS idx0,
           CAST(y AS BIGINT) AS y, CAST(total_h AS BIGINT) AS total_h
    FROM ypos
    """,
)
def w5_y_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = diagram.positioned_items_chunked(
        scenario_flat(scenario_source(spark, sf_dir)),
        "doc_id", "__cats", nested=False,
    )
    return pos.select(
        "doc_id",
        F.col("idx0").cast("int"),
        F.col("y").cast("long").alias("y"),
        F.col("total_h").cast("long").alias("total_h"),
    )


@register(
    "w6_category_ranges",
    survey_ref="W6/A5 (src/render_pdf.py:257-269)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, category,
           CAST(min(i) AS INT) AS first_idx,
           CAST(max(i) AS INT) AS last_idx,
           CAST((min(i) + max(i)) // 2 AS INT) AS mid_idx
    FROM cls GROUP BY doc_id, category
    """,
)
def w6_category_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = scenario_struct(scenario_source(spark, sf_dir))
    items = diagram.flatten_renumber(df, "doc_id")
    return diagram.category_ranges(items, "doc_id").select(
        "doc_id",
        "category",
        F.col("first_idx").cast("int"),
        F.col("last_idx").cast("int"),
        F.col("mid_idx").cast("int"),
    )


@register(
    "a6_boundary_analysis",
    survey_ref="A6 (src/extract.py:344,352-367)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT DISTINCT doc_id,
           CAST(to_json(CASE WHEN n_doubles >= 2 THEN [3, 6]
                WHEN n_doubles = 1 THEN [3]
                ELSE CAST([] AS INT[]) END) AS VARCHAR) AS boundaries,
           CAST(least(n_doubles, 2) AS INT) AS n_boundaries,
           CASE WHEN n_doubles >= 1 THEN 3 END AS b1,
           CASE WHEN n_doubles >= 2 THEN 6 END AS b2
    FROM tok
    """,
)
def a6_boundary_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted boundary set + the ≥2/==1/0 case analysis as columns.
    The set itself is emitted as to_json (driver gate can't hash lists)."""
    src = scenario_source(spark, sf_dir)
    b = F.array_sort("boundaries")
    return src.select(
        "doc_id",
        F.to_json(b).alias("boundaries"),
        F.size(b).cast("int").alias("n_boundaries"),
        F.get(b, 0).alias("b1"),
        F.get(b, 1).alias("b2"),
    )


@register(
    "p11_scenario_presence",
    survey_ref="P11 (src/extract.py:266-269; src/render_pdf.py:393-394)",
    oracle="""
    SELECT doc_id, (doc_id % 10 <> 0) AS has_scenario
    FROM documents
    """,
)
def p11_scenario_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 10th case gets an empty scenario; presence = any category
    non-empty after chunking."""
    src = scenario_source(spark, sf_dir).withColumn(
        "items",
        F.when(F.col("doc_id") % 10 == 0, F.expr("CAST(array() AS ARRAY<STRING>)"))
        .otherwise(F.col("items")),
    )
    df = scenario_struct(src)
    return df.select(
        "doc_id", nested.scenario_presence(F.col("scenario")).alias("has_scenario")
    )


# --------------------------------------------------------------------------
# Diagram draw-ops (W5+W7+F14+F15 composition over the layout tables)
# --------------------------------------------------------------------------


@register(
    "diagram_rects",
    survey_ref="rect emission (src/render_pdf.py:238-255) over W3/W5",
    bench=True,
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(i AS INT) AS idx0, 'rect' AS op,
           CAST(20 + i * 38 AS BIGINT) AS x,
           CAST(total_h - y - 55 AS BIGINT) AS y_pdf,
           CAST(420 AS BIGINT) AS w, CAST(55 AS BIGINT) AS h,
           CASE category WHEN 'cause' THEN '#dce6f1'
                WHEN 'action' THEN '#e2efda' ELSE '#fce4d6' END AS fill,
           printf('%02d. %s', i + 1, item) AS label
    FROM ypos
    """,
)
def diagram_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = diagram.positioned_items_chunked(
        scenario_flat(scenario_source(spark, sf_dir)),
        "doc_id", "__cats", nested=False,
    )
    out = diagram.rect_ops(pos, "doc_id")
    return out.select(
        "doc_id",
        F.col("idx0").cast("int"),
        "op",
        F.col("x").cast("long"),
        F.col("y_pdf").cast("long"),
        F.col("w").cast("long"),
        F.col("h").cast("long"),
        "fill",
        "label",
    )


@register(
    "diagram_separator_lines",
    survey_ref="W7 (src/render_pdf.py:285-299)",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, CAST(i AS INT) AS idx0, line_type,
           CAST(CASE WHEN line_type = 'double' THEN 20 + (i+1)*38 - 10
                     ELSE 20 + (i+1)*38 END AS BIGINT) AS x_start,
           CAST(CASE WHEN line_type = 'double' THEN 20 + (i+1)*38 - 10 + 420 + 20
                     ELSE 20 + (i+1)*38 + 420 END AS BIGINT) AS x_end,
           total_h - (y + 72 + CASE WHEN line_type = 'double' THEN 25.0 ELSE 15.0 END)
             - 27.5 AS y_line
    FROM ypos
    WHERE line_type IS NOT NULL AND i < n_real - 1
    """,
)
def diagram_separator_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = diagram.positioned_items_chunked(
        scenario_flat(scenario_source(spark, sf_dir)),
        "doc_id", "__cats", nested=False,
    )
    out = diagram.separator_line_ops(pos, "doc_id")
    return out.select(
        "doc_id",
        F.col("idx0").cast("int"),
        "line_type",
        F.col("x_start").cast("long"),
        F.col("x_end").cast("long"),
        F.col("y_line").cast("double"),
    )


@register(
    "diagram_braces",
    survey_ref="category braces (src/render_pdf.py:257-283) over W6",
    oracle=f"""
    WITH {_SCN_SQL}
    SELECT doc_id, category,
           CAST(20 + max(i) * 38 + 420 + 20 AS BIGINT) AS brace_x,
           CAST(max(total_h) - min(y) AS DOUBLE) AS y_top,
           CAST(max(total_h) - max(y) - 55 AS DOUBLE) AS y_bot,
           ((max(total_h) - min(y)) + (max(total_h) - max(y) - 55)) / 2.0 AS label_y
    FROM ypos GROUP BY doc_id, category
    """,
)
def diagram_braces(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = diagram.positioned_items_chunked(
        scenario_flat(scenario_source(spark, sf_dir)),
        "doc_id", "__cats", nested=False,
    )
    out = diagram.brace_ops(pos, "doc_id")
    return out.select(
        "doc_id",
        "category",
        F.col("brace_x").cast("long"),
        F.col("y_top"),
        F.col("y_bot"),
        "label_y",
    )


# --------------------------------------------------------------------------
# Tall→wide pivot, routing, merge-dedup, fallback picks (P2/P3/P6/P7/P8, O3/O4, J3)
# --------------------------------------------------------------------------

_LABELS = ["事例名称", "死者数", "負傷者数", "事例概要"]


def _tall_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized label/value rows shaped like the reference's field
    table (FIXTURES.md B1): a wrong-bgcolor row that must be filtered
    (P2) and a duplicate label where the FIRST occurrence must win (P3
    via min_by on row_idx)."""
    o = load(spark, sf_dir, "orders")
    mk = lambda idx, label, value, bg: F.struct(  # noqa: E731
        F.lit(idx).alias("row_idx"),
        F.lit(label).alias("label") if isinstance(label, str) else label.alias("label"),
        value.alias("value"),
        F.lit(bg).alias("bgcolor"),
    )
    rows = F.array(
        mk(0, "事例名称", F.col("o_orderpriority"), "#DFE9F2"),
        mk(1, "死者数", F.format_string("%d名", (F.col("o_orderkey") % 5)), "#DFE9F2"),
        mk(2, "事例概要", F.col("o_orderstatus"), "#FFFFFF"),  # dropped by P2
        mk(3, "事例名称", F.lit("DUPLICATE"), "#dfe9f2"),  # loses to row 0
        mk(
            4,
            "負傷者数",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("なし")).otherwise(
                F.format_string("約%d名", (F.col("o_orderkey") % 11))
            ),
            "#DFE9F2",
        ),
    )
    return o.select(
        F.col("o_orderkey").alias("case_key"), F.explode(rows).alias("r")
    ).select("case_key", "r.row_idx", "r.label", "r.value", "r.bgcolor")


@register(
    "p3_label_pivot",
    survey_ref="P2+P3 (src/extract.py:57-82,132-141): bgcolor filter + kv pivot",
    oracle="""
    WITH tall AS (
      SELECT o_orderkey AS case_key, r.* FROM orders, LATERAL (VALUES
        (0, '事例名称', o_orderpriority, '#DFE9F2'),
        (1, '死者数', printf('%d名', o_orderkey % 5), '#DFE9F2'),
        (2, '事例概要', o_orderstatus, '#FFFFFF'),
        (3, '事例名称', 'DUPLICATE', '#dfe9f2'),
        (4, '負傷者数', CASE WHEN o_orderkey % 3 = 0 THEN 'なし'
                            ELSE printf('約%d名', o_orderkey % 11) END, '#DFE9F2')
      ) r(row_idx, label, value, bgcolor)),
    kept AS (SELECT * FROM tall WHERE upper(bgcolor) = '#DFE9F2')
    SELECT case_key,
           coalesce(arg_min(value, row_idx) FILTER (label = '事例名称'), '') AS case_name,
           coalesce(TRY_CAST(regexp_extract(
             coalesce(arg_min(value, row_idx) FILTER (label = '死者数'), ''),
             '\\d+', 0) AS INT), 0) AS deaths,
           coalesce(TRY_CAST(regexp_extract(
             coalesce(arg_min(value, row_idx) FILTER (label = '負傷者数'), ''),
             '\\d+', 0) AS INT), 0) AS injuries,
           coalesce(arg_min(value, row_idx) FILTER (label = '事例概要'), '') AS summary
    FROM kept GROUP BY case_key
    """,
)
def p3_label_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-cell predicate → first-wins pivot → typed projections.
    ``first()`` after a shuffle is nondeterministic; ``min_by(value,
    row_idx)`` is the order-safe 'first occurrence' (SURVEY §7.4-1).
    Missing labels surface as '' like the reference's get_text."""
    tall = _tall_rows(spark, sf_dir)
    wide = (
        tall.filter(F.upper("bgcolor") == "#DFE9F2")
        .groupBy("case_key")
        .pivot("label", _LABELS)
        .agg(F.min_by("value", "row_idx"))
    )
    get = lambda l: F.coalesce(F.col(f"`{l}`"), F.lit(""))  # noqa: E731
    return wide.select(
        "case_key",
        get("事例名称").alias("case_name"),
        scalar.leading_int(get("死者数")).alias("deaths"),
        scalar.leading_int(get("負傷者数")).alias("injuries"),
        get("事例概要").alias("summary"),
    )


@register(
    "p6_url_route",
    survey_ref="P6 (src/run.py:68-77)",
    oracle="""
    WITH urls AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0
                    THEN 'https://www.shippai.org/fkd/lis/hyaku_lis.html'
                  WHEN o_orderkey % 11 = 1 THEN 'https://other.example.org/page'
                  ELSE printf('https://www.shippai.org/fkd/cf/CZ%07d.html', o_orderkey)
             END AS url
      FROM orders)
    SELECT o_orderkey, url,
           CASE WHEN url LIKE '%/lis/%' THEN 'expand'
                WHEN url LIKE '%/cf/%' THEN 'direct'
                ELSE 'skip' END AS route
    FROM urls
    """,
)
def p6_url_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worklist routing: /lis/ beats /cf/ beats warn-skip, mirroring the
    reference's if/elif chain."""
    o = load(spark, sf_dir, "orders")
    url = (
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.lit("https://www.shippai.org/fkd/lis/hyaku_lis.html"),
        )
        .when(F.col("o_orderkey") % 11 == 1, F.lit("https://other.example.org/page"))
        .otherwise(
            F.format_string(
                "https://www.shippai.org/fkd/cf/CZ%07d.html", F.col("o_orderkey")
            )
        )
    )
    return o.select("o_orderkey", url.alias("url")).select(
        "o_orderkey",
        "url",
        F.when(F.col("url").contains("/lis/"), F.lit("expand"))
        .when(F.col("url").contains("/cf/"), F.lit("direct"))
        .otherwise(F.lit("skip"))
        .alias("route"),
    )


@register(
    "p7_multimedia_merge",
    survey_ref="P7+J3+O3 (src/extract.py:73-97): two-pass /mf/ scan, "
    "union-merge, first-occurrence dedup",
    oracle="""
    WITH pass1 AS (
      SELECT p_partkey % 20 AS page_id, CAST(p_partkey AS BIGINT) AS row_idx,
             printf('/mf/m%d.jpg', p_partkey % 7) AS href,
             printf('caption %d', p_partkey % 7) AS caption
      FROM part),
    pass2 AS (
      SELECT p_partkey % 20 AS page_id, CAST(100000 + p_partkey AS BIGINT) AS row_idx,
             printf('/mf/m%d.jpg', p_partkey % 11) AS href,
             printf('caption %d', p_partkey % 11) AS caption
      FROM part),
    merged AS (SELECT * FROM pass1 UNION ALL SELECT * FROM pass2)
    SELECT page_id, href, caption, min(row_idx) AS first_idx
    FROM merged WHERE href LIKE '/mf/%'
    GROUP BY page_id, href, caption
    """,
)
def p7_multimedia_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second multimedia pass merges into the first
    pass's list, keeping first occurrence in document order. Row form:
    union + groupBy(min(position)) — never dropDuplicates, whose kept
    row is shuffle-order-dependent."""
    p = load(spark, sf_dir, "part")

    def scan(offset: int, mod: int) -> DataFrame:
        return p.select(
            (F.col("p_partkey") % 20).alias("page_id"),
            (F.lit(offset) + F.col("p_partkey")).cast("long").alias("row_idx"),
            F.format_string("/mf/m%d.jpg", F.col("p_partkey") % mod).alias("href"),
            F.format_string("caption %d", F.col("p_partkey") % mod).alias("caption"),
        )

    merged = scan(0, 7).unionByName(scan(100000, 11))
    return (
        merged.filter(F.col("href").startswith("/mf/"))
        .groupBy("page_id", "href", "caption")
        .agg(F.min("row_idx").alias("first_idx"))
    )


@register(
    "p8_link_fallback",
    survey_ref="P8+O4+F10 (src/extract.py:197-210): field link else first /sf/ "
    "anchor, resolved with real urljoin semantics (src/extract.py:206,210)",
    oracle="""
    -- Expected urljoin results stated per href shape, with the page at
    -- https://www.shippai.org/fkd/cf/CZ{id}.html (directory /fkd/cf/):
    --   %4=0  no field link -> first /sf/ anchor, root-absolute
    --   %4=1  '../sf/x'     -> ../ resolves out of /cf/ into /fkd/sf/
    --   %4=2  '/fkd/sf/x'   -> root-absolute against the origin
    --   %4=3  absolute href -> passes through untouched
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN printf('https://www.shippai.org/sf/anchor%d.html',
                                doc_id % 5)
             WHEN 1 THEN printf('https://www.shippai.org/fkd/sf/field%d.html',
                                doc_id)
             WHEN 2 THEN printf('https://www.shippai.org/fkd/sf/field%d.html',
                                doc_id)
             ELSE printf('https://cdn.example.org/sf/field%d.html', doc_id)
           END AS scenario_url,
           doc_id % 4 = 0 AS used_fallback
    FROM documents
    """,
)
def p8_link_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce(explicit link, first /sf/ anchor in document order) —
    O4 first-match via element_at(filter(...), 1) — then resolved
    against the page URL with urljoin semantics (relative, ``../``,
    root-absolute, and already-absolute hrefs all behave like
    urllib.parse.urljoin)."""
    d = load(spark, sf_dir, "documents")
    page_url = F.format_string(
        "https://www.shippai.org/fkd/cf/CZ%07d.html", F.col("doc_id")
    )
    m = F.col("doc_id") % 4
    field_link = (
        F.when(m == 0, F.lit(None).cast("string"))
        .when(m == 1, F.format_string("../sf/field%d.html", F.col("doc_id")))
        .when(m == 2, F.format_string("/fkd/sf/field%d.html", F.col("doc_id")))
        .otherwise(
            F.format_string("https://cdn.example.org/sf/field%d.html", F.col("doc_id"))
        )
    )
    anchors = F.array(
        F.lit("/cf/case.html"),
        F.format_string("/sf/anchor%d.html", F.col("doc_id") % 5),
        F.lit("/sf/second.html"),
    )
    first_sf = F.try_element_at(
        F.filter(anchors, lambda x: x.startswith("/sf/")), F.lit(1)
    )
    return d.select(
        "doc_id",
        scalar.resolve_url(page_url, F.coalesce(field_link, first_sf)).alias(
            "scenario_url"
        ),
        field_link.isNull().alias("used_fallback"),
    )


@register(
    "o3_first_occurrence_dedup",
    survey_ref="O3 row form (src/extract.py:96-97) with explicit position key",
    oracle="""
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def o3_first_occurrence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the first (by event_id) row per (user_id, event_type).
    dropDuplicates would keep an arbitrary row after the shuffle; the
    window + rn=1 form is deterministic and scales (single shuffle on
    the dedup key)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "o3_array_distinct_ordered",
    survey_ref="O3 array form (src/extract.py:96-97): array_distinct keeps "
    "first occurrence",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_slice(str_split(text, ' '), 1, 20) AS toks FROM documents),
    e AS (
      SELECT doc_id, unnest(toks) AS item,
             generate_subscripts(toks, 1) AS ord FROM tok),
    firsts AS (
      SELECT doc_id, item, min(ord) AS first_ord FROM e GROUP BY doc_id, item)
    SELECT doc_id,
           CAST(to_json(array_agg(item ORDER BY first_ord)) AS VARCHAR) AS deduped
    FROM firsts GROUP BY doc_id
    """,
)
def o3_array_distinct_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle computes first-occurrence order from scratch — proving
    array_distinct's order-preservation, not assuming it. Output array
    is to_json'd for the driver gate (pandas can't hash list cells)."""
    d = load(spark, sf_dir, "documents")
    toks = F.slice(F.split("text", " "), 1, 20)
    return d.select(
        "doc_id", F.to_json(nested.dedup_preserving_order(toks)).alias("deduped")
    )
