"""Record/report/manifest sinks and re-sources (SURVEY.md §2.1 S5–S8).

  - S5 JSON case sink: one JSON document per case (distributed write;
    per-case filenames are a driver-side rename concern, kept out of
    executors).
  - S6 PDF report sink: foreachPartition emitter, STUBBED — reportlab
    is not in this container; the layout math lives in
    operators/diagram.py and renders to draw-ops rows instead. The
    reportlab branch raises NotImplementedError loudly.
  - S7 run-manifest sink: max+1 numbered results_NNN.json; sequencing
    is inherently single-writer → computed on the driver
    (SURVEY §7.4 item 4). The streaming analog is foreachBatch batchId
    (streaming/windows.py).
  - S8 case re-source: read saved case JSON back under CASE_SCHEMA.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.schemas import CASE_SCHEMA


def write_cases_json(cases: DataFrame, out_dir: str) -> None:
    """S5: distributed JSON write (one line-delimited part per task).
    UTF-8 with non-ASCII preserved — Spark never ASCII-escapes."""
    cases.write.mode("overwrite").json(out_dir)


def read_cases_json(spark: SparkSession, path: str) -> DataFrame:
    """S8: schema-pinned read-back (never infer — at 100 TB inference
    is a full extra pass)."""
    return spark.read.schema(CASE_SCHEMA).json(path)


def next_manifest_name(out_dir: str) -> str:
    """S7/F13/A2: results_(NNN).json max+1 sequencing, driver-side.
    Mirrors src/run.py:135-142 including the empty-dir → 001 case."""
    seq = 0
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            m = re.fullmatch(r"results_(\d+)\.json", name)
            if m:
                seq = max(seq, int(m.group(1)))
    return f"results_{seq + 1:03d}.json"


def write_manifest(manifest_row: dict, out_dir: str) -> str:
    """Write one pretty-printed UTF-8 manifest (ensure_ascii=False per
    requirements.md:43-77 worked example). Single JSON object, single
    writer — this is a run summary, not data."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, next_manifest_name(out_dir))
    with open(path, "w", encoding="utf-8") as f:
        json.dump(manifest_row, f, ensure_ascii=False, indent=2)
    return path


def render_pdf_sink(cases: DataFrame, out_dir: str) -> None:
    """S6: per-partition PDF emission. reportlab is absent here, so this
    raises; the distributed shape (foreachPartition, one PDF per row,
    no driver collect) is what matters architecturally."""

    def emit(rows) -> None:  # pragma: no cover - requires reportlab
        try:
            import reportlab  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PDF rendering needs reportlab (not in this container); "
                "use operators.diagram draw-ops + write_cases_json instead"
            ) from e

    cases.foreachPartition(emit)


def json_roundtrip_check(cases: DataFrame) -> DataFrame:
    """F17/F18 pairing: serialize each case to JSON and parse it back —
    to_json ∘ from_json must be lossless under CASE_SCHEMA."""
    js = F.to_json(F.struct(*[F.col(f.name) for f in CASE_SCHEMA.fields]))
    back = F.from_json(js, CASE_SCHEMA)
    checks = [
        (F.col(f.name) == back.getField(f.name))
        | (F.col(f.name).isNull() & back.getField(f.name).isNull())
        for f in CASE_SCHEMA.fields
    ]
    ok = checks[0]
    for c in checks[1:]:
        ok = ok & c
    return cases.select(F.col("case_id"), ok.alias("roundtrip_ok"))
