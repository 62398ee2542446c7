"""Round-close gates, in parallel: pytest (sharded by test file) and
the full DuckDB oracle sweep run as concurrent processes so the
combined gate is bounded by the slowest shard instead of the serial
sum (VERDICT r09 #7: serial close-out hit ~21 min and grows with the
registry; target <= 15 min).

Usage:
    python tools/run_gates.py [--pytest-shards N] [--no-sweep] [--no-pytest]

Each pytest shard is a separate process with its own SparkSession
(session-scoped fixture => one JVM per shard; shards are file-disjoint
so fixtures never cross processes).  Shard assignment is greedy
longest-processing-time over measured per-file durations (the WEIGHTS
table, refreshed from a `--durations` run when the suite changes;
unknown files get the median weight).  Exit code is nonzero if ANY
component fails; per-component logs land in /tmp/gates_*.log and a
one-line JSON summary is printed last.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Seconds per test FILE from the r10 baseline run (`pytest tests/ -q
# --durations=0` on an otherwise-idle box, per-file sums).  These only
# steer shard BALANCE — staleness degrades balance, never correctness.
WEIGHTS = {
    "test_streaming.py": 300.0,
    "test_dedup.py": 150.0,
    "test_plans.py": 105.0,
    "test_scale.py": 60.0,
    "test_round8_ops.py": 50.0,
    "test_round7_ops.py": 45.0,
    "test_round6_ops.py": 45.0,
    "test_sketches.py": 40.0,
    "test_pagerank.py": 35.0,
    "test_graph.py": 35.0,
    "test_similarity_multimodal.py": 30.0,
    "test_properties.py": 25.0,
    "test_bpe.py": 25.0,
    "test_textio.py": 20.0,
    "test_sampling.py": 20.0,
    "test_packing.py": 15.0,
    "test_pca.py": 15.0,
    "test_asof.py": 10.0,
    "test_inverted_index.py": 10.0,
    "test_textops.py": 10.0,
}


def _shards(n: int) -> list[list[str]]:
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    known = [w for f, w in WEIGHTS.items() if f in files]
    default = sorted(known)[len(known) // 2] if known else 30.0
    buckets: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=lambda f: -WEIGHTS.get(f, default)):
        w, members = min(buckets, key=lambda b: b[0])
        i = buckets.index((w, members))
        members.append(f)
        buckets[i] = (w + WEIGHTS.get(f, default), members)
    return [m for _, m in buckets]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pytest-shards", type=int, default=2)
    ap.add_argument("--sweep-shards", type=int, default=3)
    ap.add_argument("--no-sweep", action="store_true")
    ap.add_argument("--no-pytest", action="store_true")
    ap.add_argument("--sweep-sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    procs: dict[str, tuple[subprocess.Popen, str, float]] = {}

    def _launch(name: str, cmd: list[str]) -> None:
        log = f"/tmp/gates_{name}.log"
        f = open(log, "w")
        p = subprocess.Popen(
            cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT
        )
        procs[name] = (p, log, time.time())
        print(f"[gates] launched {name}: {' '.join(cmd[:6])}... -> {log}")

    if not args.no_pytest:
        for i, shard in enumerate(_shards(args.pytest_shards)):
            _launch(
                f"pytest{i}",
                [sys.executable, "-m", "pytest", "-q"]
                + [os.path.join("tests", f) for f in shard],
            )
    sweep_parts: list[str] = []
    if not args.no_sweep:
        # the FULL registry sweep, sharded into cost-balanced parallel
        # processes (check_oracle --shard=i/K partitions the registry
        # deterministically and completely) — registry growth raises
        # max-shard wall-clock ~1/K instead of the serial sum
        # (VERDICT r10 #5: keep round-close <= 15 min WITHOUT dropping
        # sweep coverage).
        for i in range(args.sweep_shards):
            part = f"/tmp/gates_sweep{i}.json"
            sweep_parts.append(part)
            env = dict(os.environ, ORACLE_SWEEP_JSON=part)
            log = f"/tmp/gates_sweep{i}.log"
            f = open(log, "w")
            p = subprocess.Popen(
                [
                    sys.executable,
                    "tools/check_oracle.py",
                    f"--shard={i}/{args.sweep_shards}",
                    args.sweep_sf,
                ],
                cwd=REPO,
                stdout=f,
                stderr=subprocess.STDOUT,
                env=env,
            )
            procs[f"sweep{i}"] = (p, log, time.time())
            print(f"[gates] launched sweep{i} -> {log}")

    summary: dict[str, dict] = {}
    rc = 0
    for name, (p, log, t0) in procs.items():
        code = p.wait()
        secs = round(time.time() - t0, 1)
        tail = ""
        try:
            with open(log) as f:
                tail = "".join(f.readlines()[-3:]).strip()[-300:]
        except OSError:
            pass
        summary[name] = {"exit": code, "sec": secs, "tail": tail}
        print(f"[gates] {name}: exit={code} {secs}s")
        if code:
            rc = 1
    if sweep_parts and rc == 0:
        queries: dict = {}
        failed: list = []
        sf_dir = args.sweep_sf
        for part in sweep_parts:
            try:
                with open(part) as f:
                    d = json.load(f)
                queries.update(d.get("queries", {}))
                failed.extend(d.get("failed", []))
                sf_dir = d.get("sf_dir", sf_dir)
            except (OSError, ValueError) as exc:
                print(f"[gates] merge skipped {part}: {exc}")
        merged = {
            "sf_dir": sf_dir,
            "n_queries": len(queries),
            "n_pass": sum(
                1
                for v in queries.values()
                if v.get("status") in ("OK", "rows-only")
            ),
            "failed": failed,
            "shards": len(sweep_parts),
            "queries": queries,
        }
        out = os.environ.get(
            "ORACLE_SWEEP_JSON", "/tmp/gates_sweep_merged.json"
        )
        with open(out, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(
            f"[gates] merged sweep artifact ({len(queries)} queries) -> {out}"
        )
    print(json.dumps({"ok": rc == 0, "components": summary}))
    return rc


if __name__ == "__main__":
    sys.exit(main())
