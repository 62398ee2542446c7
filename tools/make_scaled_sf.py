"""Synthesize a larger scale factor from an existing testdata dir by
dense doc_id replication (driver testdata stops at sf0.1; the bench's
scaling-trend section needs an sf1-class point for the headline
iteratives).

Replication semantics: the wiki corpus derives its ENTIRE link graph
from ``doc_id`` arithmetic mod N (sources/wikicorpus.py), so emitting
factor× copies with ``doc_id = k*N + old_id`` keeps ids dense in
[0, factor*N) and yields a genuinely factor×-larger graph with the
same structural mix (pipes/nests/ghosts/danglers scale
proportionally).  Text columns are copied as-is, which also gives the
near-dup pipeline a factor×-deeper exact-duplicate load.

Usage: python tools/make_scaled_sf.py [src_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 -> <repo>/.benchdata/sf1, factor 10.
Only ``documents.parquet`` is scaled — the headline iteratives
(i1/cc/o1/x33/g5) read nothing else.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def make_scaled(src_dir: str, out_dir: str, factor: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "documents.parquet")
    table = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    df = table.to_pandas()
    n = int(df["doc_id"].max()) + 1
    if sorted(df["doc_id"]) != list(range(n)):
        raise ValueError("source doc_ids must be dense 0..N-1")
    copies = []
    for k in range(factor):
        c = df.copy()
        c["doc_id"] = c["doc_id"] + k * n
        copies.append(c)
    import pandas as pd

    out = pd.concat(copies, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False), out_path
    )
    return out_path


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".benchdata", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(make_scaled(src, out, factor))
