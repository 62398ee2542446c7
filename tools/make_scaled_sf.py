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

Vocabulary modes (VERDICT r09 #1): the default ``vocab="replica"``
draws mutation tokens from (replica, position) only — per-replica
vocabulary is bounded by the max document length (~500 spellings), so
the sf10 distinct domain stays ~50k and the vocab-scale operators
(two-phase KMV, the x103 gram-model join, x94's hapax join, x58's
SymSpell blocking) never see the regime they are armored for.
``vocab="growing"`` appends a ``doc_id % VOCAB_RESIDUES`` component,
so distinct spellings scale ~linearly with the corpus (measured:
~180k at factor 10, ~1.8M at factor 100) while each spelling still
repeats (mean multiplicity ~4-5 — a Heaps-law-at-beta~1 stand-in, not
an all-hapax degenerate): the distinct aggregates still combine
map-side, and the KMV prefilter's proven branch actually fires.

Embeddings (VERDICT r09 #6): ``embeddings.parquet`` (if present in
``src``) is scaled alongside: replica k >= 1 vectors are rotated by a
deterministic random ORTHOGONAL matrix Q_k, which preserves every
within-replica cosine EXACTLY (the per-replica near-dup/cluster
structure equals the base corpus, so pairs scale linearly) while
cross-replica cosines are ~N(0, 1/dim) (|cos| ~ 0.125 at dim 64) —
nowhere near the 0.95 near-dup threshold.  Labels are preserved, so
the x15/x55 label-cell blocking sees factor×-larger cells and the SRP
refinement path is genuinely exercised.  Replica 0 stays
byte-identical.

Usage: python tools/make_scaled_sf.py [src_dir] [out_dir] [factor] [vocab]
Defaults: /root/testdata/sf0.1 -> <repo>/.benchdata/sf1, factor 10,
vocab "replica".  Only ``documents.parquet`` and (when present)
``embeddings.parquet`` are scaled — the decade queries read nothing
else.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MUTATE_RATE = 4  # replace every 4th token in replicas k >= 1
# vocab="boiler" (skew regime, round 11): replica-mode mutation PLUS a
# fixed 10-token boilerplate run spliced into every k >= 1 replica,
# aligned to the x60 paragraph grain.  Models web boilerplate ("all
# rights reserved...") — the adversarial key-skew regime for
# paragraph-grain dedup (one para_hash covers ~90% of the corpus),
# shingle DF filters (ubiquitous shingles must generate NO candidate
# pairs), and LSH bucket audits.
BOILER_TOKENS = 10  # == operators.dedup.PARA_WORDS
BOILERPLATE = [
    "clickx", "herex", "tox", "subscribex", "andx",
    "sharex", "thisx", "postx", "nowx", "todayx",
]
N_FILES = 32  # splittable input: one task per file floor (see below)
VOCAB_RESIDUES = 251  # prime; "growing" vocab ~ replicas x positions x 251

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
# v4: adds the vocab mode (documents bytes for vocab="replica" are
# IDENTICAL to v3 — r09 decade numbers stay comparable) and scaled
# embeddings; the marker carries the vocab mode.
GENERATOR_VERSION = "v4_mutrate4_split32"


def marker_name(vocab: str = "replica") -> str:
    return f".generated_by_{GENERATOR_VERSION}_{vocab}"


def _alpha(n: int) -> str:
    """Letters-only encoding of an int (digits map a-j) — survives the
    repo's strip-non-alpha tokenization intact."""
    return "".join(chr(ord("a") + int(c)) for c in str(n))


def _mutate(text: str, k: int, doc_id: int, rate: int, vocab: str) -> str:
    toks = text.split(" ")
    if rate:
        phase = (5 * k + doc_id) % rate
        if vocab == "growing":
            d = _alpha(doc_id % VOCAB_RESIDUES)
            for i in range(phase, len(toks), rate):
                toks[i] = f"zz{_alpha(k)}q{_alpha(i)}d{d}"
        else:
            for i in range(phase, len(toks), rate):
                toks[i] = f"zz{_alpha(k)}q{_alpha(i)}"
    if vocab == "boiler" and len(toks) >= 2 * BOILER_TOKENS:
        # splice the FIXED boilerplate run over tokens [10, 20) — one
        # full x60 paragraph window (PARA_WORDS = 10), so ~(factor-1)/
        # factor of the corpus shares ONE para_hash and every
        # boilerplate shingle has df ~ corpus size.  Replica 0 stays
        # byte-identical (goldens), so the splice rides the k >= 1
        # mutation pass only.
        toks[BOILER_TOKENS : 2 * BOILER_TOKENS] = BOILERPLATE
    return " ".join(toks)


def _write_sharded(df, out_path: str, key: str, n_files: int) -> None:
    """Round-robin shard by id so every part file carries a uniform
    slice of every replica (a contiguous split would give file-local
    id ranges, which some id-arithmetic queries could exploit)."""
    os.makedirs(out_path, exist_ok=True)
    for old in os.listdir(out_path):
        os.remove(os.path.join(out_path, old))
    for s in range(n_files):
        shard = df[df[key] % n_files == s]
        pq.write_table(
            pa.Table.from_pandas(shard, preserve_index=False),
            os.path.join(out_path, f"part-{s:05d}.parquet"),
        )


def _scale_embeddings(src_dir: str, out_dir: str, factor: int) -> None:
    src = os.path.join(src_dir, "embeddings.parquet")
    if not os.path.exists(src):
        return
    import pandas as pd

    df = pq.read_table(src).to_pandas()
    n = int(df["vec_id"].max()) + 1
    dim = len(df["embedding"].iloc[0])
    base = np.array(df["embedding"].tolist(), dtype=np.float64)
    copies = []
    for k in range(factor):
        c = df.copy()
        c["vec_id"] = c["vec_id"] + k * n
        if k:
            # deterministic orthogonal Q_k: QR of a seeded Gaussian;
            # sign-fix the diagonal so Q is unique given R's signs
            rs = np.random.RandomState(1_000_003 * k + 7)
            q, r = np.linalg.qr(rs.standard_normal((dim, dim)))
            q = q * np.sign(np.diag(r))
            rotated = (base @ q).astype(np.float32)
            c["embedding"] = [row for row in rotated]
        copies.append(c)
    out = pd.concat(copies, ignore_index=True)
    _write_sharded(out, os.path.join(out_dir, "embeddings.parquet"),
                   "vec_id", min(N_FILES, 8))


def make_scaled(
    src_dir: str,
    out_dir: str,
    factor: int,
    mutate_rate: int = MUTATE_RATE,
    vocab: str = "replica",
) -> str:
    if vocab not in ("replica", "growing", "boiler"):
        raise ValueError(f"unknown vocab mode {vocab!r}")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "documents.parquet")
    if os.path.isfile(out_path):  # pre-v3 single-file layout
        os.remove(out_path)
    for stale in os.listdir(out_dir):  # drop other-version markers
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
        # the boiler splice is part of the vocab MODE, not the mutation
        # rate — a marker claiming the skew regime must never sit on a
        # boilerplate-free corpus (review finding, r11 ext)
        if k and (mutate_rate or vocab == "boiler"):
            c["text"] = [
                _mutate(t, k, int(d), mutate_rate, vocab)
                for t, d in zip(c["text"], c["doc_id"])
            ]
        copies.append(c)
    import pandas as pd

    out = pd.concat(copies, ignore_index=True)
    _write_sharded(out, out_path, "doc_id", N_FILES)
    _scale_embeddings(src_dir, out_dir, factor)
    with open(os.path.join(out_dir, marker_name(vocab)), "w") as f:
        f.write(f"factor={factor} mutate_rate={mutate_rate} vocab={vocab}\n")
    return out_path


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".benchdata", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    vocab = sys.argv[4] if len(sys.argv) > 4 else "replica"
    print(make_scaled(src, out, factor, vocab=vocab))
