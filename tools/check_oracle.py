"""Local mimic of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB,
compare row-count + schema-ish + order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [--changed-only[=REF]] [sf_dir] [name ...]

``--changed-only`` (default REF HEAD~1) restricts the sweep to the
queries whose code plausibly changed vs REF (per-function module
attribution; core-file edits select everything) — the mid-round
iteration mode.  The FULL sweep stays the round-close gate.

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


def _changed_query_names(base: str) -> set[str]:
    """Names of registered queries whose code plausibly changed vs
    ``base`` (VERDICT r07 #8): a query is selected when its defining
    plans module, or any package module its SOURCE references
    (``operators.foo`` / ``functions`` / ``streaming`` / ``sources``),
    is among the git-diff-touched files.  Edits to cross-cutting core
    files (session, registry, tables, textops) select EVERYTHING —
    conservative by design.  Module granularity, so a one-function
    edit re-checks its whole module's queries; the FULL sweep stays
    the round-close gate."""
    import inspect
    import re
    import subprocess

    pkg = "pagerank_using_mapreduce_spark"
    out = subprocess.run(
        ["git", "diff", "--name-only", base, "--"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    touched = {
        ln.strip() for ln in out.splitlines() if ln.strip().endswith(".py")
    }
    pkg_touched = {p for p in touched if p.startswith(pkg + "/")}
    core = {
        f"{pkg}/session.py",
        f"{pkg}/plans/registry.py",
        f"{pkg}/sources/tables.py",
        f"{pkg}/functions/textops.py",
        "__spark_entry__.py",
    }
    qs = entrymod.queries()
    if touched & core:
        return set(qs)
    if not pkg_touched:
        return set()

    # attribution is PER QUERY FUNCTION, not per defining module:
    # plans/extensions.py holds ~140 queries and a module-level
    # `dedup as dd` alias, so whole-module scanning would select 60%
    # of the registry for any dedup.py edit.  A query references a
    # package module through (a) a lazy `from ..operators.x import`
    # in its own body, (b) a module-level alias (`dd.`) used in its
    # body, or (c) a same-module helper it calls that does either —
    # one level of helper closure covers the _docs/_oracle pattern.
    direct_re = re.compile(
        r"from \.\.(operators|functions|streaming|sources)\.(\w+) import"
    )
    alias_re = re.compile(
        r"from \.\.(operators|functions|streaming|sources) import "
        r"(\w+)(?:\s+as\s+(\w+))?"
    )
    call_re = re.compile(r"\b(\w+)\s*\(")

    mod_cache: dict[str, tuple[dict, dict]] = {}

    def _module_maps(fn):
        modname = fn.__module__
        if modname not in mod_cache:
            module = sys.modules[modname]
            msrc = inspect.getsource(module)
            aliases = {}
            for m in alias_re.finditer(msrc):
                sub, leaf, al = m.group(1), m.group(2), m.group(3)
                aliases[al or leaf] = f"{pkg}/{sub}/{leaf}.py"
            helpers = {
                n: f
                for n, f in inspect.getmembers(module, inspect.isfunction)
                if getattr(f, "__module__", None) == modname
            }
            mod_cache[modname] = (aliases, helpers)
        return mod_cache[modname]

    def _fn_files(fn, depth=1) -> set[str]:
        files: set[str] = set()
        try:
            files.add(os.path.relpath(inspect.getfile(fn), "/root/repo"))
            src = inspect.getsource(fn)
        except (TypeError, OSError):
            return {"<unattributable>"}
        aliases, helpers = _module_maps(fn)
        for m in direct_re.finditer(src):
            files.add(f"{pkg}/{m.group(1)}/{m.group(2)}.py")
        for al, f in aliases.items():
            if re.search(rf"\b{al}\.", src):
                files.add(f)
        if depth > 0:
            for callee in set(call_re.findall(src)):
                h = helpers.get(callee)
                if h is not None and h is not fn:
                    files |= _fn_files(h, depth - 1)
        return files

    sel: set[str] = set()
    for name, fn in qs.items():
        files = _fn_files(fn)
        if "<unattributable>" in files or files & pkg_touched:
            sel.add(name)
    return sel


def _shard_names(i: int, k: int) -> set[str]:
    """Deterministic complete partition of the registry into k
    cost-balanced shards (greedy LPT over the last recorded per-query
    sweep seconds; unknown queries get the median weight) — the
    round-close full sweep runs as k parallel processes whose union is
    exactly the registry (tools/run_gates.py --sweep-shards)."""
    import glob

    names = sorted(entrymod.queries())
    weights: dict[str, float] = {}
    recs = sorted(glob.glob("/root/repo/ORACLE_SWEEP_r*.json"))
    if recs:
        try:
            with open(recs[-1]) as f:
                data = json.load(f)
            for n, row in data.get("queries", data).items():
                if isinstance(row, dict) and "spark_sec" in row:
                    weights[n] = float(row.get("spark_sec", 0) or 0) + float(
                        row.get("duck_sec", 0) or 0
                    )
        except (OSError, ValueError):
            pass
    med = (
        sorted(weights.values())[len(weights) // 2] if weights else 1.0
    ) or 1.0
    buckets: list[tuple[float, int]] = [(0.0, j) for j in range(k)]
    out: dict[int, set[str]] = {j: set() for j in range(k)}
    for n in sorted(names, key=lambda n: -weights.get(n, med)):
        buckets.sort()
        w, j = buckets[0]
        out[j].add(n)
        buckets[0] = (w + weights.get(n, med), j)
    return out[i]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    changed_base = None
    shard = None
    tier = None
    for a in list(args):
        if a.startswith("--changed-only"):
            changed_base = a.split("=", 1)[1] if "=" in a else "HEAD~1"
            args.remove(a)
        elif a.startswith("--shard="):
            i, k = a.split("=", 1)[1].split("/")
            shard = (int(i), int(k))
            args.remove(a)
        elif a.startswith("--tier="):
            tier = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if tier == "core":
        from pagerank_using_mapreduce_spark.plans.registry import CORE_TIER

        sel = set(CORE_TIER)
        print(f"--tier=core: {len(sel)} queries selected")
        only = sel if not only else (only & sel)
    if shard is not None:
        sel = _shard_names(*shard)
        print(f"--shard={shard[0]}/{shard[1]}: {len(sel)} queries selected")
        only = sel if not only else (only & sel)
    if changed_base is not None:
        sel = _changed_query_names(changed_base)
        print(
            f"--changed-only vs {changed_base}: {len(sel)} queries selected"
        )
        if not sel:
            print("nothing touched; all green (vacuously)")
            return 0
        only = sel if not only else (only & sel)
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
