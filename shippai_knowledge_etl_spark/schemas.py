"""Canonical schemas for the nested case model and run manifest.

CASE_SCHEMA mirrors the reference's output JSON contract
(requirements.md:107-142; FIXTURES.md B3) with the date split into
``date_str`` (normalized-or-raw passthrough, reference-faithful) and
``date`` (typed, null on garbage) per SURVEY.md §7.4 item 3.

MANIFEST_SCHEMA mirrors results_NNN.json (requirements.md:43-77) as one
wide nullable shape for the three status-dependent record kinds
(src/run.py:95-119).
"""

from __future__ import annotations

from pyspark.sql import types as T

SCENARIO_SCHEMA = T.StructType(
    [
        T.StructField("cause", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("action", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("result", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)

CASE_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.StringType(), nullable=False),
        T.StructField("case_name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date_str", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("location", T.StringType()),
        T.StructField("facility", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("phenomenon", T.StringType()),
        T.StructField("process", T.StringType()),
        T.StructField("cause", T.StringType()),
        T.StructField("response", T.StringType()),
        T.StructField("countermeasure", T.StringType()),
        T.StructField("knowledge", T.ArrayType(T.StringType())),
        T.StructField("background", T.StringType()),
        T.StructField("scenario", SCENARIO_SCHEMA),
        T.StructField(
            "images",
            T.StructType(
                [
                    T.StructField("representative", T.StringType()),
                    T.StructField(
                        "multimedia",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("caption", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("sources", T.ArrayType(T.StringType())),
        T.StructField(
            "casualties",
            T.StructType(
                [
                    T.StructField("deaths", T.IntegerType()),
                    T.StructField("injuries", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("financial_damage", T.StringType()),
        T.StructField("social_impact", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("field", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
    ]
)

MANIFEST_CASE_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.StringType()),
        T.StructField("case_name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("outputs", T.ArrayType(T.StringType())),
        T.StructField("missing_fields", T.ArrayType(T.StringType())),
        T.StructField("message", T.StringType()),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.IntegerType(), nullable=False),
        T.StructField("processed_at", T.TimestampType()),
        T.StructField(
            "summary",
            T.StructType(
                [
                    T.StructField("total", T.LongType()),
                    T.StructField("n_success", T.LongType()),
                    T.StructField("n_excluded", T.LongType()),
                    T.StructField("n_error", T.LongType()),
                ]
            ),
        ),
        T.StructField("cases", T.ArrayType(MANIFEST_CASE_SCHEMA)),
    ]
)

# Tall pre-parsed HTML rows (FIXTURES.md B1) — output of the HTML edge
# parser, input to P2/P3.
PAGE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("row_idx", T.IntegerType(), nullable=False),
        T.StructField("label", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("bgcolor", T.StringType()),
        T.StructField("href", T.StringType()),
    ]
)
