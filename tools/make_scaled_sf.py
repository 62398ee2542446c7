"""Synthesize a larger scale factor from an existing testdata dir by
dense doc_id replication (driver testdata stops at sf0.1; the bench's
scaling-trend section needs sf1/sf10-class points for the headline
iteratives AND the near-dup family).

Replication semantics: the wiki corpus derives its ENTIRE link graph
from ``doc_id`` arithmetic mod N (sources/wikicorpus.py), so emitting
factor× copies with ``doc_id = k*N + old_id`` keeps ids dense in
[0, factor*N) and yields a genuinely factor×-larger graph with the
same structural mix (pipes/nests/ghosts/danglers scale
proportionally).

Replica MUTATION (VERDICT r06 #5): copying text verbatim makes every
replica an exact duplicate of its source, so the true near-dup pair
relation grows QUADRATICALLY in ``factor`` — which is why x33 could
not be put on the sf10 decade before.  Replicas k >= 1 therefore get
deterministic token-level noise: every ``mutate_rate``-th token
(phase-shifted per (k, doc)) is replaced by a replica-specific
letters-only token.  At rate 4 with 3-token shingles only ~a quarter of a
replica's shingles survive in common with its source (J ≈ 0.14 <
every near-dup threshold in the repo), so cross-replica pairs vanish,
cluster sizes stay bounded, and the near-dup relation scales
LINEARLY — while the token/char volume still scales by ``factor``.
Replica 0 is always byte-identical to the source, so sf-invariant
goldens on low doc_ids keep holding.

Usage: python tools/make_scaled_sf.py [src_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 -> <repo>/.benchdata/sf1, factor 10.
Only ``documents.parquet`` is scaled — the headline iteratives
(i1/cc/o1/g5) and the near-dup family (x33/x108) read nothing else.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

MUTATE_RATE = 4  # replace every 4th token in replicas k >= 1
N_FILES = 32  # splittable input: one task per file floor (see below)

# Bumped whenever the generated data changes semantically; consumers
# (bench._sf1_dir) gate cached-dir reuse on a marker file carrying it,
# so a dir built by an older generator is rebuilt, never reused.
# v3: documents.parquet is a DIRECTORY of N_FILES part files instead
# of one single-row-group file.  The old layout was unsplittable
# (55 MB < maxPartitionBytes AND one row group), so EVERY decade scan
# ran as ONE task — sf10's 27M-token tokenize pass measured 22 s of
# single-core work on a 32-core box, an artifact no 100 TB input
# (thousands of files) would ever exhibit.  Decade numbers before the
# v3 re-base measure that artifact; see BENCH_LOCAL_r09 notes.
GENERATOR_VERSION = "v3_mutrate4_split32"


def _alpha(n: int) -> str:
    """Letters-only encoding of an int (digits map a-j) — survives the
    repo's strip-non-alpha tokenization intact."""
    return "".join(chr(ord("a") + int(c)) for c in str(n))


def _mutate(text: str, k: int, doc_id: int, rate: int) -> str:
    toks = text.split(" ")
    phase = (5 * k + doc_id) % rate
    for i in range(phase, len(toks), rate):
        toks[i] = f"zz{_alpha(k)}q{_alpha(i)}"
    return " ".join(toks)


def make_scaled(
    src_dir: str, out_dir: str, factor: int, mutate_rate: int = MUTATE_RATE
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "documents.parquet")
    if os.path.isfile(out_path):  # pre-v3 single-file layout
        os.remove(out_path)
    for stale in os.listdir(out_dir):  # drop pre-v3 version markers
        if stale.startswith(".generated_by_"):
            os.remove(os.path.join(out_dir, stale))
    table = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    df = table.to_pandas()
    n = int(df["doc_id"].max()) + 1
    if sorted(df["doc_id"]) != list(range(n)):
        raise ValueError("source doc_ids must be dense 0..N-1")
    copies = []
    for k in range(factor):
        c = df.copy()
        c["doc_id"] = c["doc_id"] + k * n
        if k and mutate_rate:
            c["text"] = [
                _mutate(t, k, int(d), mutate_rate)
                for t, d in zip(c["text"], c["doc_id"])
            ]
        copies.append(c)
    import pandas as pd

    out = pd.concat(copies, ignore_index=True)
    # shard round-robin by doc_id so every part file carries a uniform
    # slice of every replica (a contiguous split would give file-local
    # id ranges, which some id-arithmetic queries could exploit)
    os.makedirs(out_path, exist_ok=True)
    for old in os.listdir(out_path):
        os.remove(os.path.join(out_path, old))
    for s in range(N_FILES):
        shard = out[out["doc_id"] % N_FILES == s]
        pq.write_table(
            pa.Table.from_pandas(shard, preserve_index=False),
            os.path.join(out_path, f"part-{s:05d}.parquet"),
        )
    with open(
        os.path.join(out_dir, f".generated_by_{GENERATOR_VERSION}"), "w"
    ) as f:
        f.write(f"factor={factor} mutate_rate={mutate_rate}\n")
    return out_path


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".benchdata", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(make_scaled(src, out, factor))
