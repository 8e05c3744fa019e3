"""Skew-resilient joins: explicit key salting.

Spark's AQE splits skewed partitions for sort-merge joins at runtime,
but three production cases fall outside it: Structured Streaming (no
AQE), shuffled-hash joins pinned by hints, and pipelines that must be
deterministic across retries (AQE re-plans per attempt).  For those,
the classic fix is explicit salting:

- the skewed (large) side spreads each key across ``buckets`` synthetic
  sub-keys via a deterministic row hash — never ``rand()``, whose
  re-rolls under task retry silently duplicate/drop rows;
- the other side replicates each row ``buckets`` times so every
  sub-key finds its match;
- with a ``hot_keys`` list (e.g. from the Misra-Gries sketch in
  operators/sketch.py), only hot keys are salted/replicated, so the
  replication cost is |hot| · buckets instead of |right| · buckets —
  the bounded form a 100 TB join actually uses.

The result is row-for-row identical to the plain equi-join (inner/left),
just with a balanced shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    hot_keys: Optional[DataFrame] = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's key skew spread over ``buckets``.

    ``hot_keys``: optional single- or multi-column DataFrame of exactly
    the ``on`` columns; when given, only those keys are salted (and only
    their right rows replicated).  Must be small (it is broadcast).
    ``how``: 'inner' or 'left' (left = keep unmatched left rows).
    """
    on = list(on)
    assert buckets >= 1
    assert how in ("inner", "left"), how
    # deterministic spread: hash EVERY left column so two identical rows
    # still co-locate (harmless) but distinct rows of one hot key fan out
    spread = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    all_salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))

    if hot_keys is None:
        l = left.withColumn("__salt", spread)
        r = right.withColumn("__salt", all_salts)
    else:
        assert list(hot_keys.columns) == on, (hot_keys.columns, on)
        hot = F.broadcast(hot_keys.withColumn("__hot", F.lit(True)))
        l = (
            left.join(hot, on, "left")
            .withColumn("__salt", F.when(F.col("__hot"), spread).otherwise(F.lit(0)))
            .drop("__hot")
        )
        r_hot = right.join(hot, on, "left")
        r = (
            r_hot.filter(F.col("__hot").isNull())
            .withColumn("__salt", F.lit(0))
            .unionByName(r_hot.filter(F.col("__hot")).withColumn("__salt", all_salts))
            .drop("__hot")
        )
    return l.join(r, on + ["__salt"], how).drop("__salt")
