"""Simulate the driver's verify pass against __spark_entry__.py.

Usage: python scripts/driver_sim.py [sf_dir]

Runs entry(spark) (smoke), then every queries()[name] at sf_dir
(default sf0.01) and compares row-count / sorted-column-names /
order-insensitive canonical values against oracle_sql()[name] via
DuckDB. Prints one line per query and a final summary.
"""

from __future__ import annotations

import datetime
import math
import sys
import traceback
from decimal import Decimal
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "asDict"):  # pyspark Row (a tuple subclass - check first)
        return canon(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):
        return canon(v.asDict())
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from shippai_knowledge_etl_spark.session import get_spark

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    smoke = e.entry(spark).collect()
    print(f"entry(): {len(smoke)} rows {'OK' if len(smoke) > 0 else 'FAIL'}")

    q, o = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in q.items():
        try:
            df = fn(spark, sf_dir)
            scols = sorted(df.columns)
            srows = sorted(
                repr(tuple(canon(r[c]) for c in scols)) for r in df.collect()
            )
            if name not in o:
                print(f"  {name}: rows-only, {len(srows)} rows OK")
                n_pass += 1
                continue
            res = con.execute(o[name])
            names = [d[0] for d in res.description]
            order = sorted(range(len(names)), key=lambda i: names[i])
            drows = sorted(
                repr(tuple(canon(row[i]) for i in order)) for row in res.fetchall()
            )
            dcols = sorted(names)
            if scols != dcols:
                print(f"  {name}: FAIL cols {scols} != {dcols}")
                n_fail += 1
            elif len(srows) != len(drows):
                print(f"  {name}: FAIL rowcount {len(srows)} != {len(drows)}")
                n_fail += 1
            elif srows != drows:
                diff = next((a, b) for a, b in zip(srows, drows) if a != b)
                print(f"  {name}: FAIL values, first diff: {diff[0][:200]} != {diff[1][:200]}")
                n_fail += 1
            else:
                print(f"  {name}: OK ({len(srows)} rows, hash-match)")
                n_pass += 1
        except Exception as ex:
            print(f"  {name}: ERROR {type(ex).__name__}: {ex}")
            traceback.print_exc(limit=3)
            n_fail += 1

    print(f"SUMMARY: {n_pass} pass, {n_fail} fail, sf_dir={sf_dir}")
    spark.stop()
    return 1 if n_fail or len(smoke) == 0 else 0


if __name__ == "__main__":
    sys.exit(main())
