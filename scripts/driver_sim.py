"""Simulate the driver's verify pass against __spark_entry__.py.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]

Runs entry(spark) (smoke), then every queries()[name] at sf_dir
(default sf0.01) and compares row-count / sorted-column-names /
order-insensitive canonical values against oracle_sql()[name] via
DuckDB. Prints one line per query and a final summary.

Faithfulness to the real driver (round-1 lesson — do NOT soften):
  - the driver canonicalizes through pandas (Spark ``toPandas`` vs
    DuckDB ``.df()``); list-valued cells crash its factorize/sort path
    (``TypeError: unhashable type: 'list'``) → we PRE-FAIL any query
    whose Spark output schema contains Array/Map/Struct columns;
  - Spark DECIMAL outputs arrive as ``Decimal`` objects while DuckDB
    yields float64, so numerically-equal values hash differently → we
    PRE-FAIL DecimalType output columns (queries must cast to rounded
    DOUBLE at the gate boundary);
  - floats are compared by exact repr (no rounding leniency): if the
    two engines' doubles differ in the last ulp the real driver's hash
    differs too.
"""

from __future__ import annotations

import datetime
import math
import sys
import traceback
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Spark output types the real driver cannot canonicalize (or canonicalizes
# asymmetrically vs DuckDB). Presence in a FINAL schema is a gate bug.
_FORBIDDEN_SPARK_TYPES = ("ArrayType", "MapType", "StructType", "DecimalType")


def forbidden_output_types(df) -> list[str]:
    bad = []
    for f in df.schema.fields:
        tname = type(f.dataType).__name__
        if tname in _FORBIDDEN_SPARK_TYPES:
            bad.append(f"{f.name}:{tname}")
    return bad


def canon(v):
    """Type-strict canonical cell value. Decimal stays tagged as Decimal
    (so Decimal-vs-float64 fails, as it does in the real driver); floats
    keep full repr; lists/dicts raise like pandas factorize does."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(f"unhashable type: {type(v).__name__!r}")
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        d = v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
        d = d.replace(tzinfo=None)
        # DATE columns surface as datetime.date from Spark toPandas but as
        # midnight Timestamps from DuckDB .df(); the real driver treats
        # them as equal (f1_date_normalize passed round 1), so fold
        # midnight datetimes onto the date form.
        if (d.hour, d.minute, d.second, d.microsecond) == (0, 0, 0, 0):
            return d.date().isoformat()
        return d.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_frame(pdf: pd.DataFrame) -> tuple[list[str], list[str]]:
    """(sorted column names, sorted canonical row reprs) — raises on
    list-typed cells exactly where the driver's canonicalizer does."""
    cols = sorted(pdf.columns)
    rows = []
    for row in pdf[cols].itertuples(index=False, name=None):
        rows.append(repr(tuple(canon(v) for v in row)))
    rows.sort()
    return cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    smoke = e.entry(spark).collect()
    print(f"entry(): {len(smoke)} rows {'OK' if len(smoke) > 0 else 'FAIL'}")

    q, o = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for pos, (name, fn) in enumerate(q.items(), 1):
        if only and name not in only:
            continue
        tag = f"#{pos:02d} {name}"
        try:
            df = fn(spark, sf_dir)
            if name not in o:
                # the real driver's rows-only check never canonicalizes
                # values, so array/decimal outputs are legal here
                print(f"  {tag}: rows-only, {df.count()} rows OK")
                n_pass += 1
                continue
            bad = forbidden_output_types(df)
            if bad:
                print(f"  {tag}: FAIL forbidden output types {bad}")
                n_fail += 1
                continue
            scols, srows = canon_frame(df.toPandas())
            dcols, drows = canon_frame(con.execute(o[name]).df())
            if scols != dcols:
                print(f"  {tag}: FAIL cols {scols} != {dcols}")
                n_fail += 1
            elif len(srows) != len(drows):
                print(f"  {tag}: FAIL rowcount {len(srows)} != {len(drows)}")
                n_fail += 1
            elif srows != drows:
                diff = next((a, b) for a, b in zip(srows, drows) if a != b)
                print(
                    f"  {tag}: FAIL values, first diff: "
                    f"{diff[0][:200]} != {diff[1][:200]}"
                )
                n_fail += 1
            else:
                print(f"  {tag}: OK ({len(srows)} rows, hash-match)")
                n_pass += 1
        except Exception as ex:
            print(f"  {tag}: ERROR {type(ex).__name__}: {ex}")
            traceback.print_exc(limit=3)
            n_fail += 1

    print(f"SUMMARY: {n_pass} pass, {n_fail} fail, sf_dir={sf_dir}")
    spark.stop()
    return 1 if n_fail or len(smoke) == 0 else 0


if __name__ == "__main__":
    sys.exit(main())
