"""Local mimic of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB,
compare row-count + schema-ish + order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [name ...]

Set ``ORACLE_SWEEP_JSON=/path/out.json`` to also write a structured
artifact: {name: {"status": "...", "rows": N, "spark_sec": s,
"duck_sec": s}} plus a summary header — the end-of-round full-sweep
record (VERDICT r06 #8) so coverage never has to be reconstructed
from rotation files.
"""

from __future__ import annotations

import sys
import time

import duckdb
import json
import os
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from pagerank_using_mapreduce_spark.sources.tables import TABLES  # noqa: E402


def bare_spark():
    """A session like the DRIVER builds — deliberately NOT the repo's
    get_spark factory, so any query that silently depends on a conf our
    factory sets (the r01 nanosAsLong failure mode) fails here first."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = bare_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    sweep: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in os_:
            print(f"{name}: rows-only ({len(sdf)} rows) spark={t1 - t0:.1f}s")
            sweep[name] = {
                "status": "rows-only",
                "rows": len(sdf),
                "spark_sec": round(t1 - t0, 2),
            }
            continue
        ddf = con.execute(os_[name]).df()
        t2 = time.time()
        status = "OK"
        if len(sdf) != len(ddf):
            status = f"ROWCOUNT spark={len(sdf)} duck={len(ddf)}"
        elif sorted(sdf.columns) != sorted(ddf.columns):
            status = f"COLS spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
        else:
            a, b = canon(sdf), canon(ddf)
            # dtype drift IS a failure: the driver hashes pandas values,
            # so e.g. DuckDB HUGEINT→float64 hash-mismatches even when
            # every value is numerically identical (the r01 SUM bug).
            dt = [
                (c, str(a[c].dtype), str(b[c].dtype))
                for c in a.columns
                if str(a[c].dtype) != str(b[c].dtype)
            ]
            if dt:
                status = f"DTYPE {dt}"
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False)
            except AssertionError as exc:
                status = "VALUES " + str(exc).split("\n")[0]
                for col in a.columns:
                    if not a[col].equals(b[col]):
                        neq = (a[col] != b[col]).sum()
                        print(f"   col {col}: {neq} mismatched")
                        mism = a[col] != b[col]
                        print("   spark:", a[mism].head(3).to_dict("records"))
                        print("   duck :", b[mism].head(3).to_dict("records"))
        print(
            f"{name}: {status} ({len(sdf)} rows, spark={t1 - t0:.1f}s duck={t2 - t1:.1f}s)"
        )
        if status != "OK":
            failed.append(name)
        sweep[name] = {
            "status": status if status == "OK" else status[:160],
            "rows": len(sdf),
            "spark_sec": round(t1 - t0, 2),
            "duck_sec": round(t2 - t1, 2),
        }
    out_json = os.environ.get("ORACLE_SWEEP_JSON")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(sweep),
                    "n_pass": sum(
                        1 for v in sweep.values()
                        if v["status"] in ("OK", "rows-only")
                    ),
                    "failed": failed,
                    "queries": sweep,
                },
                f,
                indent=1,
            )
        print(f"sweep artifact -> {out_json}")
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
