"""Temporal join operators: as-of join and binned interval (range) join.

The reference engine has neither (its surface stops at equi/theta joins
over HBase scans — SURVEY §2.2); these are the two temporal primitives a
large-scale event/training-data pipeline needs, implemented Spark-first:

``asof_join``
    For each left row, the most recent right row with
    ``right.ts <= left.ts`` (optionally strict ``<`` and/or within a
    tolerance), per key.  Spark has no ASOF JOIN; the naive formulation
    (theta join + window) explodes into a per-key cross product.  This
    implementation is the sort-merge formulation: tag both sides, union,
    ONE hash-shuffle on the key with a per-partition sort on
    ``(ts, side)``, then a running ``last(right_payload, ignorenulls)``
    window carries the latest right row forward onto each left row.
    Cost is O(n log n) per key group with zero join amplification — at
    100 TB the only shuffle is the same one a groupBy(key) would pay,
    and skew is bounded by per-key row counts, not per-key pair counts.

``interval_join_binned``
    points ⋈ intervals on ``start <= ts < end`` with NO equi key.
    Spark plans a bare range predicate as BroadcastNestedLoopJoin (or
    worse, a cartesian product) — O(|points|·|intervals|).  The binned
    formulation quantizes time into fixed-width bins: each point lands
    in exactly one bin, each interval is exploded to the bins it
    overlaps, and the join becomes a plain shuffled equi-join on the bin
    id plus a codegen residual filter.  Cost is
    O(|points| + |intervals|·span/bin + |matches|), the standard
    big×big interval-join strategy; replication factor is bounded and
    asserted via ``max_bins_per_interval``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    strict: bool = False,
    tolerance_us: Optional[int] = None,
) -> DataFrame:
    """Backward as-of left join: latest right row at-or-before each left row.

    Matches DuckDB ``l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts``
    (``strict=True`` ⇒ ``>``).  ``tolerance_us`` voids matches older
    than the given microsecond gap (match columns become NULL, the left
    row is kept).  Right rows must be unique per ``(on..., right_ts)``;
    pre-aggregate the right side if they are not, or the match is
    nondeterministic (same contract as DuckDB, which errors instead).

    Returns all left columns plus ``right_ts+suffix`` and each of
    ``right_cols`` suffixed.
    """
    on = list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    payload_fields = [F.col(right_ts).alias("__rts")] + [
        F.col(c).alias(c) for c in right_cols
    ]
    # side ordering at equal ts decides inclusivity: right-before-left
    # (0 < 1) lets a tied right row match; strict flips the order so the
    # running window has not yet seen it
    r_side, l_side = (0, 1) if not strict else (1, 0)

    left_cols = left.columns
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.struct(*payload_fields).alias("__rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r.unionByName(l)
        .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__side") == l_side)
    )
    if tolerance_us is not None:
        in_tol = (
            F.col("__m").isNotNull()
            & (
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
                <= F.lit(tolerance_us)
            )
        )
        merged = merged.withColumn("__m", F.when(in_tol, F.col("__m")))
    out = [F.col(f"__l_{c}").alias(c) for c in left_cols]
    out.append(F.col("__m.__rts").alias(right_ts + suffix))
    out += [F.col(f"__m.{c}").alias(c + suffix) for c in right_cols]
    return merged.select(*out)


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    how: str = "inner",
    max_bins_per_interval: int = 256,
    check_explosion: bool = True,
) -> DataFrame:
    """Join points to half-open intervals ``[start, end)`` via time bins.

    Both inputs may be arbitrarily large: the plan is a shuffled
    equi-join on the bin id (SortMergeJoin / ShuffledHashJoin — never a
    nested-loop), with the exact range predicate re-applied as a codegen
    residual.  Each point hashes to one bin; each interval replicates to
    ``ceil(span / bin)`` bins, bounded by ``max_bins_per_interval``
    (violations raise up front via one aggregate over the intervals side
    — the small side of the explosion — rather than OOMing the join).

    ``how='inner'`` keeps matched pairs; ``'left_points'`` keeps
    unmatched points with NULL interval columns (per-bin left join is
    sound because a point's single bin sees every interval overlapping
    that bin).
    """
    bin_us = int(bin_seconds) * 1_000_000
    assert bin_us > 0, "bin_seconds must be positive"
    if check_explosion:
        worst = intervals.agg(
            F.max(
                F.floor((F.unix_micros(F.col(end_col)) - 1) / bin_us)
                - F.floor(F.unix_micros(F.col(start_col)) / bin_us)
                + 1
            ).alias("bins")
        ).collect()[0]["bins"]
        if worst is not None and worst > max_bins_per_interval:
            raise ValueError(
                f"interval spans up to {worst} bins (> {max_bins_per_interval}); "
                "raise bin_seconds or max_bins_per_interval"
            )
    p = points.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_ts)) / bin_us)
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bin_us),
                F.floor((F.unix_micros(F.col(end_col)) - 1) / bin_us),
            )
        ),
    )
    cond = (
        (p["__bin"] == i["__bin"])
        & (p[point_ts] >= i[start_col])
        & (p[point_ts] < i[end_col])
    )
    joined = p.join(i, cond, "inner" if how == "inner" else "left")
    drop = [p["__bin"], i["__bin"]]
    if how == "inner":
        return joined.drop(*drop)
    assert how == "left_points", how
    return joined.drop(*drop)
