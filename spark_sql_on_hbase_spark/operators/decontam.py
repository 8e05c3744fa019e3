"""Benchmark decontamination: flag / strip training documents that share
word n-grams with an evaluation (benchmark) set.

This is the standard eval-leak guard a training-data pipeline runs before
every corpus release (the reference engine has no analog — this is one of
the beyond-reference LLM-pipeline operators): tokenize both sides, build
word n-gram shingles, and mark any training doc containing a shingle that
also occurs in the benchmark.

Scale design (100 TB corpus vs a ~MB..GB benchmark):
- The benchmark side is tiny relative to the corpus (eval sets are at
  most millions of n-grams).  Its distinct shingle hashes are built once
  and BROADCAST; the corpus side never shuffles its text — the only
  wide operation is the per-doc hit-count groupBy on ``(id)`` whose
  input is already reduced map-side to (id, gram_hash) pairs and whose
  partial aggregation combines before the exchange.
- Shingle explosion is map-local; hashes (60-bit) travel, never gram
  strings.
- ``LEFT SEMI`` would lose the zero-hit docs, so the hit count comes
  from a broadcast LEFT join + conditional count; docs with no grams at
  all (shorter than *n* tokens) keep ``n_grams = 0`` and are never
  flagged.

All arithmetic is reproducible by the DuckDB oracle (hash60 = md5-prefix,
exact integer counts, fixed-point ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.functions.text import hash60
from spark_sql_on_hbase_spark.operators.dedup import _shingles, _spread


def ngram_hash_set(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", n: int = 4
) -> DataFrame:
    """Distinct 60-bit hashes of the word *n*-grams across all of ``docs``.

    This is the benchmark-side index: one column ``gram_hash``, distinct,
    small enough to broadcast.
    """
    # native word_ngrams shingling (see dedup._shingles, r15)
    return (
        _shingles(_spread(docs), text_col, id_col, n, distinct=False)
        .select(hash60(F.col("s")).alias("gram_hash"))
        .distinct()
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    max_hit_ratio: float = 0.0,
) -> DataFrame:
    """Per-corpus-doc contamination report against ``benchmark``.

    Returns ``(id_col, n_grams, n_hits, hit_ratio, contaminated)`` where
    ``n_grams`` counts the doc's distinct word n-grams, ``n_hits`` how
    many of those also occur anywhere in the benchmark, ``hit_ratio`` is
    ``n_hits / n_grams`` (0 for gram-less docs, 6 decimals fixed-point),
    and ``contaminated`` is true when ``hit_ratio > max_hit_ratio`` (so
    the default 0.0 flags ANY shared n-gram — the conservative standard).
    """
    bench_idx = ngram_hash_set(benchmark, text_col=text_col, id_col=id_col, n=n)

    # native shingling + scale-adaptive _spread (see dedup._shingles/
    # _spread); outer keeps gram-less docs
    grams = _shingles(
        _spread(corpus), text_col, id_col, n, distinct=False, outer=True
    ).select(id_col, hash60(F.col("s")).alias("gram_hash"))
    hits = grams.join(
        F.broadcast(bench_idx.withColumn("_hit", F.lit(1))), "gram_hash", "left"
    )
    # two-level aggregation instead of two countDistincts (r15, guide
    # §2.3): two distinct aggregates over variants of the same key made
    # Catalyst Expand the gram stream ×2 before the exchange; grouping
    # to distinct (doc, gram) pairs first ships each pair once (with
    # map-side partial combine) and the per-doc counts reduce the tiny
    # pair frame.  max(_hit) per pair equals the hit flag — _hit is a
    # property of the hash, constant across its occurrences.
    # explode_outer emits one NULL-gram row for gram-less docs; its
    # hash is NULL, never matches, and count(col) ignores it exactly
    # like countDistinct did.
    per_pair = hits.groupBy(id_col, "gram_hash").agg(F.max("_hit").alias("_hit"))
    per_doc = per_pair.groupBy(id_col).agg(
        F.count("gram_hash").alias("n_grams"),
        F.count(F.when(F.col("_hit").isNotNull(), F.lit(1))).alias("n_hits"),
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        F.floor(F.col("n_hits") / F.col("n_grams") * 1000000) / 1000000,
    ).otherwise(F.lit(0.0))
    # the verdict compares on EXACT counts (n_hits > max_ratio·n_grams ⇔
    # n_hits/n_grams > max_ratio), never the floored report ratio — a doc
    # with >10⁶ grams and one hit floors to 0.0 and would silently escape
    # the "any shared n-gram" contract at max_hit_ratio = 0
    contaminated = F.col("n_hits") > F.lit(max_hit_ratio) * F.col("n_grams")
    return per_doc.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_hits"),
        ratio.alias("hit_ratio"),
        contaminated.alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    max_hit_ratio: float = 0.0,
) -> DataFrame:
    """``corpus`` minus the docs :func:`contamination_flags` marks.

    The join back is an equi-join on the id — at scale both sides are
    hash-partitioned on ``id_col`` and the flag side is narrow (5 cols).
    """
    flags = contamination_flags(
        corpus,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        n=n,
        max_hit_ratio=max_hit_ratio,
    )
    keep = flags.filter(~F.col("contaminated")).select(id_col)
    return corpus.join(keep, id_col, "inner")
