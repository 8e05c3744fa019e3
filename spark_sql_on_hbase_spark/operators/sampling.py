"""Deterministic corpus sampling / split assignment.

A 100 TB training-data pipeline cannot sample with ``rand()``: task
retries and speculative execution re-roll the dice, so two runs (or two
attempts of the same stage!) disagree about which rows were kept.  Every
operator here instead derives its randomness from ``hash60`` (the
engine's cross-engine md5-based hash, functions/text.py) of a salted
row key, which makes sampling

- **deterministic & retry-safe** — a row's fate is a pure function of
  its key, stable across runs, retries, and engines (the DuckDB oracle
  reproduces it bit-for-bit);
- **shuffle-free** — pure map-side projection + filter inside
  whole-stage codegen; no exchange, no driver round-trip, fully
  pushdown-compatible upstream;
- **consistent across tables** — the same key+salt samples the same
  entities everywhere, so a document and its derived rows land in the
  same split (the standard leakage guard for train/val/test).

The reference engine has no sampling surface at all; this is
beyond-reference pipeline functionality (brief: training-data ops).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.functions.localdf import local_rows_df

from spark_sql_on_hbase_spark.functions.text import hash60

# hash-space resolution for rate comparisons: rates are exact multiples
# of 1e-6, which keeps the oracle integer-only (no float thresholds)
RESOLUTION = 1_000_000


def sample_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, RESOLUTION) from a salted key — the shared
    primitive: ``hash60(salt || '|' || key) % RESOLUTION``."""
    return hash60(F.concat(F.lit(salt + "|"), key.cast("string"))) % RESOLUTION


def hash_sample(df: DataFrame, key: str, rate: float, salt: str = "smp") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose bucket < rate."""
    thresh = int(round(rate * RESOLUTION))
    return df.filter(sample_bucket(F.col(key), salt) < thresh)


def assign_split(
    df: DataFrame,
    key: str,
    weights: Mapping[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1},
    salt: str = "spl",
    out_col: str = "split",
) -> DataFrame:
    """Add a split-name column by cumulative weight over the hash bucket.

    Split boundaries follow dict order; weights must sum to 1.  The
    assignment is consistent: any table keyed by the same entity gets
    the identical split, preventing train/test leakage across derived
    datasets.
    """
    total = sum(weights.values())
    assert abs(total - 1.0) < 1e-9, f"weights sum to {total}, expected 1"
    bucket = sample_bucket(F.col(key), salt)
    expr, acc = None, 0.0
    for name, w in weights.items():
        acc += w
        bound = int(round(acc * RESOLUTION))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    key: str,
    domain: str,
    weights_ppm: Mapping[str, int],
    total: int,
    salt: str = "mix",
) -> DataFrame:
    """Sample toward a target MIXTURE: pick ~``total`` rows whose domain
    shares match ``weights_ppm`` (parts-per-million, summing to 1e6).

    Unlike ``stratified_sample`` (caller supplies per-stratum rates),
    this SOLVES for the rates from the corpus itself: domain d with
    ``n_d`` rows and target share ``w_d`` gets rate
    ``min(1, total * w_d / n_d)`` — i.e. the per-domain Bernoulli rate
    that yields ``total * w_d`` expected rows, clamped when the corpus
    cannot supply the demand (no upsampling; the shortfall is reported
    honestly by the output size).  This is the standard mixture-weights
    step of an LLM training-data pipeline (domain/source reweighting).

    Scale shape: ONE map-side-combinable count per domain (domains are
    vocabulary-sized), broadcast back as a rate table, then the usual
    shuffle-free deterministic hash filter.  The corpus itself is never
    shuffled, and the whole assignment is retry-safe and
    oracle-reproducible because the rate arithmetic is pure integers:
    ``thresh_ppm = least(1e6, (total * w_ppm) // n_d)``.
    """
    assert sum(weights_ppm.values()) == RESOLUTION, "weights_ppm must sum to 1e6"
    spark = df.sparkSession
    w_df = local_rows_df(
        spark, sorted(weights_ppm.items()), f"{domain} string, __w_ppm long"
    )
    counts = df.groupBy(domain).agg(F.count(F.lit(1)).alias("__n_d"))
    rates = (
        counts.join(F.broadcast(w_df), domain, "inner")
        .select(
            domain,
            # `div` = exact integer floor division on longs (matches the
            # oracle's `//`); a double `/` could round x.999… up before
            # truncation
            F.least(
                F.lit(RESOLUTION).cast("long"),
                F.expr(f"({int(total)} * __w_ppm) div __n_d"),
            ).alias("__thresh"),
        )
    )
    return (
        df.join(F.broadcast(rates), domain, "inner")
        .filter(sample_bucket(F.col(key), salt) < F.col("__thresh"))
        .drop("__thresh")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "str",
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downsample dominant languages).

    The stratum→rate table is broadcast-joined (it is vocabulary-sized),
    so the plan stays a map-side BroadcastHashJoin + filter — no shuffle
    of the corpus.  Strata absent from ``rates`` use ``default_rate``.
    """
    spark = df.sparkSession
    rows = [(k, int(round(v * RESOLUTION))) for k, v in sorted(rates.items())]
    rate_df = local_rows_df(spark, rows, f"{strata} string, __thresh int")
    default_thresh = int(round(default_rate * RESOLUTION))
    return (
        df.join(F.broadcast(rate_df), strata, "left")
        .withColumn("__thresh", F.coalesce(F.col("__thresh"), F.lit(default_thresh)))
        .filter(sample_bucket(F.col(key), salt) < F.col("__thresh"))
        .drop("__thresh")
    )


def leakage_safe_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: Mapping[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1},
    salt: str = "spl",
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Train/val/test split where NEAR-DUPLICATE documents always land on
    the same side: the split key is each doc's duplicate-cluster
    representative (min reachable id through MinHash-LSH dup edges), so
    a near-copy of a training document can never leak into the eval
    split — the contamination channel a plain per-doc hash split leaves
    open.

    Scale shape: the cluster pass is the existing banded-LSH +
    O(log diameter) label propagation (`dedup.duplicate_clusters`); the
    split itself stays a map-side pure function of the representative.
    Returns docs' columns plus (split_key, split).
    """
    from spark_sql_on_hbase_spark.operators.dedup import duplicate_clusters

    clusters = duplicate_clusters(
        docs, num_perm=num_perm, bands=bands, id_col=id_col
    ).withColumnRenamed("cluster_id", "split_key")
    labeled = docs.join(clusters, id_col, "left").withColumn(
        "split_key", F.coalesce(F.col("split_key"), F.col(id_col))
    )
    return assign_split(labeled, "split_key", weights, salt=salt)
