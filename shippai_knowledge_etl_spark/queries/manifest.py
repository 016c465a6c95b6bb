"""Flagship + manifest-cluster queries (SURVEY.md §7.1).

The flagship exercises the reference's core semantic cluster —
validate → status-partition → summarize (P10 / A1 / A3 over a lookup
join J1) — on the driver's orders⋈customer tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.catalog import register
from shippai_knowledge_etl_spark.operators import quality
from shippai_knowledge_etl_spark.tables import load


def validated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders left-join customer, then 3-way status classification.

    Status semantics (deterministic stand-ins for the reference's
    success/excluded/error, ``src/run.py:93-120``):
      - error:    o_orderstatus = 'P' (the hard-failure analog)
      - excluded: any "required field" check fails (P10)
      - success:  otherwise

    The join side (customer) is dimension-ish relative to orders; at
    100 TB of orders, customer is still the small side → broadcast hint.
    Only 2 customer columns survive → column pruning reaches the scan.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
    required = {
        "customer": F.col("c_custkey").isNull(),
        "totalprice": (F.col("o_totalprice").isNull()) | (F.col("o_totalprice") <= 0),
        "priority": F.col("o_orderpriority").isNull()
        | (F.col("o_orderpriority") == ""),
        "acctbal": F.col("c_acctbal") < 0,
    }
    return quality.with_status(joined, required, F.col("o_orderstatus") == F.lit("P"))


@register(
    "a1_status_summary",
    survey_ref="P10,A1,J1 (src/run.py:126-131, src/extract.py:262-279)",
    bench=True,
    oracle="""
    WITH validated AS (
      SELECT o.*, c.c_custkey, c.c_acctbal,
             CASE
               WHEN o.o_orderstatus = 'P' THEN 'error'
               WHEN c.c_custkey IS NULL
                 OR o.o_totalprice IS NULL OR o.o_totalprice <= 0
                 OR o.o_orderpriority IS NULL OR o.o_orderpriority = ''
                 OR c.c_acctbal < 0
               THEN 'excluded'
               ELSE 'success'
             END AS status
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT count(*) AS total,
           count(CASE WHEN status = 'success' THEN 1 END) AS n_success,
           count(CASE WHEN status = 'excluded' THEN 1 END) AS n_excluded,
           count(CASE WHEN status = 'error' THEN 1 END) AS n_error
    FROM validated
    """,
)
def a1_status_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.status_summary(validated_orders(spark, sf_dir))


@register(
    "p10_missing_fields",
    survey_ref="P10 (src/extract.py:262-279)",
    oracle="""
    SELECT o.o_orderkey,
           CAST(to_json(list_filter(
             [CASE WHEN c.c_custkey IS NULL THEN 'customer' END,
              CASE WHEN o.o_totalprice IS NULL OR o.o_totalprice <= 0 THEN 'totalprice' END,
              CASE WHEN o.o_orderpriority IS NULL OR o.o_orderpriority = '' THEN 'priority' END,
              CASE WHEN c.c_acctbal < 0 THEN 'acctbal' END],
             x -> x IS NOT NULL)) AS VARCHAR) AS missing_fields
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE len(list_filter(
             [CASE WHEN c.c_custkey IS NULL THEN 'customer' END,
              CASE WHEN o.o_totalprice IS NULL OR o.o_totalprice <= 0 THEN 'totalprice' END,
              CASE WHEN o.o_orderpriority IS NULL OR o.o_orderpriority = '' THEN 'priority' END,
              CASE WHEN c.c_acctbal < 0 THEN 'acctbal' END],
             x -> x IS NOT NULL)) > 0
    """,
)
def p10_missing_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excluded rows with their reasons — the MissingFieldsError payload
    as data (reference src/extract.py:23-31). The reasons array is
    emitted as to_json: the driver's pandas canonicalizer can't hash
    list cells."""
    df = validated_orders(spark, sf_dir)
    return df.filter(F.size("missing_fields") > 0).select(
        "o_orderkey", F.to_json("missing_fields").alias("missing_fields")
    )


@register(
    "u2_status_partition",
    survey_ref="U2,P6 (src/run.py:95-119)",
    oracle="""
    WITH validated AS (
      SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderpriority,
             c.c_custkey, c.c_acctbal,
             CASE
               WHEN o.o_orderstatus = 'P' THEN 'error'
               WHEN c.c_custkey IS NULL
                 OR o.o_totalprice IS NULL OR o.o_totalprice <= 0
                 OR o.o_orderpriority IS NULL OR o.o_orderpriority = ''
                 OR c.c_acctbal < 0
               THEN 'excluded'
               ELSE 'success'
             END AS status
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT o_orderkey, status,
           CASE WHEN status = 'error' THEN 'orderstatus=P' END AS message
    FROM validated
    """,
)
def u2_status_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous status records unified into one nullable-wide shape —
    the Spark form of the reference's three dict shapes (src/run.py:95-119):
    split by status, then unionByName(allowMissingColumns=True)."""
    df = validated_orders(spark, sf_dir)
    success = df.filter(F.col("status") == "success").select("o_orderkey", "status")
    excluded = df.filter(F.col("status") == "excluded").select("o_orderkey", "status")
    error = df.filter(F.col("status") == "error").select(
        "o_orderkey", "status", F.lit("orderstatus=P").alias("message")
    )
    return success.unionByName(excluded, allowMissingColumns=True).unionByName(
        error, allowMissingColumns=True
    )
