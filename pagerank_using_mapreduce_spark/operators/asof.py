"""As-of join: for each left row, the nearest right row at-or-before
(backward) or at-or-after (forward) the left timestamp, per key — the
canonical point-in-time enrichment operator (trades, sensor reads,
feature lookups) that Spark has no built-in for.

Implementation: the union-sort trick — tag both sides, union, sort
within key by (time, side), and carry the last-seen right payload
forward with ``last(..., ignorenulls=True)``.  One shuffle on the key,
one intra-partition sort; no range explosion, no per-row Python.  This
is the formulation that survives 100 TB: both inputs hash-partition on
the key once, and skewed keys split cleanly under AQE because the
window is per-key.

``direction='forward'`` reuses the identical machinery on NEGATED sort
time (nearest-at-or-after is nearest-at-or-before under time reversal)
— no second code path to keep correct.  ``tolerance_s`` bounds the
match distance: the carried right timestamp rides along and matches
farther than the bound are nulled (then dropped under how='inner').

Right-side ties on the timestamp resolve to the largest order key
(rows sorted ascending; the later row wins `last`), matching the
oracle's ``ORDER BY t DESC, key DESC LIMIT 1`` direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """left + the nearest right row per key (``right_ts <= left_ts``
    backward / ``>=`` forward; ties at the exact timestamp are visible
    in both directions).

    Returns all left columns plus ``r_``-prefixed ``right_payload``
    columns (null when no right row qualifies — or the nearest one is
    farther than ``tolerance_s`` — and dropped under how='inner').
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sign = 1 if direction == "backward" else -1
    lcols = left.columns
    tagged_left = left.select(
        F.col(left_on).alias("_k"),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rt"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
    )
    tagged_right = right.select(
        F.col(right_on).alias("_k"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_t"),
        F.lit(0).alias("_side"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_rt"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    # Sort by signed time so 'forward' is 'backward' under reversal.
    # Right rows sort before left rows at equal timestamps (side 0 < 1):
    # an exactly-simultaneous right row IS visible to the left row.
    # Among equal-time right rows the last in sort order wins last();
    # sort by the payload columns for a deterministic winner.
    order = [(F.col("_t") * sign).asc(), F.asc("_side")] + [
        F.asc(f"_r_{c}") for c in right_payload
    ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last("_rt", ignorenulls=True).over(w).alias("_rr_t"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rr_{c}")
            for c in right_payload
        ],
    )
    ok = F.col("_rr_t").isNotNull()
    if tolerance_s is not None:
        tol_us = int(tolerance_s * 1_000_000)
        ok = ok & (F.abs(F.col("_t") - F.col("_rr_t")) <= tol_us)
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.when(ok, F.col(f"_rr_{c}")).alias(f"r_{c}")
            for c in right_payload
        ],
    )
    if how == "inner":
        out = out.where(F.col(f"r_{right_payload[0]}").isNotNull())
    return out
