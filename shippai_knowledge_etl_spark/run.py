"""CLI entry point — the reference's ``run.py`` UX on the Spark engine.

Mirrors ``/root/reference/src/run.py`` (usage at :4-13, arg parsing
:37-57, worklist routing :66-81, per-case loop :86-133, manifest
:122-146) as one declarative pipeline:

    python -m shippai_knowledge_etl_spark.run URL [URL...] \
        [--limit N] [--output-dir DIR] [--pdf]

Routing (src/run.py:66-77): ``/lis/`` list pages are expanded by
fetching and parsing their ``ul.list_all`` anchor list (S2,
src/extract.py:396-407) with ``--limit`` case links kept per list;
``/cf/`` URLs are direct case pages; anything else warns and is
skipped. An empty worklist exits 1 (src/run.py:79-81).

Where the reference loops sequentially with 30 s timeouts per fetch,
the worklist here is a DataFrame: fetches fan out partition-parallel
(errors are data, never task failures), the parse edge is the
Arrow-batched HTML UDF, and validation/status partitioning is the same
column logic the driver-verified queries use (P10/U2/A1). Artifacts
match the reference's contract: one ``{case_id}_{case_name}.json`` per
success (src/extract.py:417), a ``results_NNN.json`` run manifest with
per-case entries + summary (src/run.py:122-146), and optionally one
PDF per success via the dependency-free emitter (``--pdf``).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.functions import scalar
from shippai_knowledge_etl_spark.operators import quality
from shippai_knowledge_etl_spark.sources import sinks
from shippai_knowledge_etl_spark.sources.fetch import fetched_pages
from shippai_knowledge_etl_spark.sources.html_parse import (
    label_rows,
    list_page_links,
)

# src/extract.py:14-20 — HTML label → JSON key for required fields
REQUIRED_FIELDS = {
    "事例概要": "summary",
    "経過": "process",
    "原因": "cause",
    "対策": "countermeasure",
    "シナリオ": "scenario",
}
CASE_NAME_LABEL = "事例名称"  # src/extract.py:132
# optional fields default to "" without excluding the case
# (requirements.md:37-41)
OPTIONAL_FIELDS = {"対処": "response", "知識化": "knowledge"}


def expand_worklist(
    spark: SparkSession, urls: list[str], limit: int | None
) -> DataFrame:
    """argv URLs → one row per case URL (column ``case_url``)."""
    routed = spark.createDataFrame(
        [(u,) for u in urls], "url string"
    ).select(
        "url",
        F.when(F.col("url").contains("/lis/"), "list")
        .when(F.col("url").contains("/cf/"), "case")
        .otherwise("skip")
        .alias("route"),
    )
    for r in routed.filter(F.col("route") == "skip").collect():
        print(f"warning: unrecognized URL pattern, skipping: {r.url}",
              file=sys.stderr)

    direct = routed.filter(F.col("route") == "case").select(
        F.col("url").alias("case_url")
    )
    lists = routed.filter(F.col("route") == "list")
    if lists.isEmpty():
        return direct

    links = F.filter(
        list_page_links(F.col("page.body")),
        lambda r: r.getField("href").contains("/cf/"),
    )
    if limit is not None:
        links = F.slice(links, 1, limit)
    fetched = lists.select(
        "url", fetched_pages(F.col("url")).alias("page")
    ).cache()
    # a failed list fetch must be LOUD, not an empty expansion: the
    # explode over [] below would silently drop the whole list page
    # (reference surfaces list-expansion failures, src/run.py:66-77)
    for r in fetched.filter(F.col("page.error").isNotNull()).collect():
        print(
            f"warning: list page fetch failed ({r.page.error}), "
            f"0 cases expanded: {r.url}",
            file=sys.stderr,
        )
    expanded = (
        fetched.select("url", F.explode(links).alias("r"))
        .select(scalar.resolve_url(F.col("url"), F.col("r.href")).alias("case_url"))
    )
    return direct.unionByName(expanded)


def process_cases(cases_urls: DataFrame) -> DataFrame:
    """case URL → parsed, validated record with status (never throws:
    fetch failures → status 'error', missing fields → 'excluded')."""
    page = cases_urls.select(
        F.col("case_url"),
        scalar.case_id_from_url(F.col("case_url")).alias("case_id"),
        fetched_pages(F.col("case_url")).alias("page"),
    )
    # Generate barrier: one parse per page (same pattern as
    # run_pipeline_e2e); fetch errors carry through as null body
    parsed = page.select(
        "case_url",
        "case_id",
        F.col("page.error").alias("fetch_error"),
        F.explode(F.array(label_rows(F.col("page.body")))).alias("__rows"),
    )

    def first_val(label: str) -> F.Column:
        # label_rows pre-filtered on the bgcolor sentinel; parse output
        # order is document order, so element 1 IS the first occurrence
        hits = F.filter(
            F.col("__rows"), lambda r: r.getField("label") == F.lit(label)
        )
        return F.coalesce(
            F.try_element_at(hits, F.lit(1)).getField("value"), F.lit("")
        )

    fields = {"case_name": first_val(CASE_NAME_LABEL)}
    for label, key in {**REQUIRED_FIELDS, **OPTIONAL_FIELDS}.items():
        fields[key] = first_val(label)
    wide = parsed.select(
        "case_url", "case_id", "fetch_error",
        *[c.alias(name) for name, c in fields.items()],
    )

    # with_status wants "is missing" predicates (reference scans for
    # absent/blank values, src/extract.py:262-279)
    return quality.with_status(
        wide,
        {key: F.col(key) == "" for key in REQUIRED_FIELDS.values()},
        error_when=F.col("fetch_error").isNotNull(),
    )


def _render_pdfs(successes: DataFrame, out_dir: str) -> None:
    """Sectioned per-case report (title + field sections) through the
    draw-ops path of the S6 emitter; the diagram ops join this same
    table when scenario structure is present (operators/diagram.py)."""
    row_h, page_w, page_h = 120, 2100, 2970  # tenth-mm, A4-ish
    ops = []
    labels = ["case_name", *REQUIRED_FIELDS.values(), *OPTIONAL_FIELDS.values()]
    for i, key in enumerate(labels):
        y = page_h - (i + 1) * (row_h + 20) - 100
        null_i = F.lit(None).cast("int")
        ops.append(
            F.struct(
                F.lit(0).alias("section"),
                F.lit(i).alias("seq"),
                F.lit("text").alias("op"),
                F.lit(100).alias("x"),
                F.lit(y).alias("y"),
                null_i.alias("x2"),
                null_i.alias("y2"),
                null_i.alias("w"),
                null_i.alias("h"),
                F.lit(None).cast("string").alias("fill"),
                F.concat(F.lit(f"{key}: "), F.substring(F.col(key), 1, 120)
                         ).alias("label"),
                F.lit(page_w).alias("page_w"),
                F.lit(page_h).alias("total_h"),
            )
        )
    draw = successes.select(
        F.col("case_id").alias("doc_id"), F.explode(F.array(*ops)).alias("o")
    ).select("doc_id", "o.*")
    sinks.render_pdf_sink(draw, out_dir, id_col="doc_id")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="shippai_knowledge_etl_spark.run",
        description="Extract failure-knowledge cases (Spark engine)",
    )
    p.add_argument("urls", nargs="+", help="case (/cf/) or list (/lis/) URLs")
    p.add_argument("--limit", type=int, default=None,
                   help="max cases expanded per list page")
    p.add_argument("--output-dir", default="data")
    p.add_argument("--pdf", action="store_true",
                   help="also render one PDF report per success")
    args = p.parse_args(argv)

    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("shippai-etl-run")
    worklist = expand_worklist(spark, args.urls, args.limit)
    if worklist.isEmpty():  # src/run.py:79-81
        print("error: empty worklist", file=sys.stderr)
        return 1

    records = process_cases(worklist).cache()
    successes = records.filter(F.col("status") == quality.STATUS_SUCCESS)

    out = args.output_dir
    sinks.write_cases_json_named(
        successes.drop("fetch_error", "missing_fields", "status"), out
    )
    if args.pdf:
        _render_pdfs(successes, out)

    # manifest: per-case entries with status-dependent payloads +
    # summary (src/run.py:122-146); run-manifest cardinality, so the
    # driver-side collect is one small row per case
    entries = records.select(
        "case_url", "case_id", "status",
        F.when(
            F.col("status") == quality.STATUS_SUCCESS,
            scalar.output_filename(F.col("case_id"), F.col("case_name"), "json"),
        ).alias("output"),
        F.when(
            F.col("status") == quality.STATUS_EXCLUDED, F.col("missing_fields")
        ).alias("missing_fields"),
        F.when(
            F.col("status") == quality.STATUS_ERROR, F.col("fetch_error")
        ).alias("message"),
    ).collect()
    summary = quality.status_summary(records).collect()[0].asDict()
    manifest = {
        "summary": summary,
        "cases": [
            {k: v for k, v in r.asDict().items() if v is not None}
            for r in entries
        ],
    }
    path = sinks.write_manifest(manifest, out)
    print(f"manifest: {path}")
    records.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
