"""Frequency sketches: exact distributed top-k and Misra-Gries heavy
hitters — the "most frequent shingles / domains / terms over 100 TB"
primitive of a training-data pipeline (beyond-reference surface; the
reference engine has no sketch operators).

Two tiers, mirroring the dedup/ANN families:

- ``topk_terms``: EXACT top-k by count.  ``orderBy(...).limit(k)``
  compiles to ``TakeOrderedAndProject`` — per-partition bounded heaps
  merged on the driver, NOT a global sort: only k rows per partition
  move, so the pattern holds at any scale.  The one full shuffle is the
  count aggregation itself (map-side partial combine).
- ``heavy_hitters_mg``: Misra-Gries summaries per Arrow batch, merged
  with one tiny shuffle of ≤ capacity rows per batch.  Capture
  guarantee: every term with true frequency > N/capacity appears in the
  output (if f > N/c globally then f_b > N_b/c in at least one batch,
  since otherwise f = Σf_b ≤ ΣN_b/c = N/c).  Counts are lower bounds
  (underestimated by ≤ N/c).  This is the scale path when even the
  (term, count) aggregate is too hot to shuffle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = r"[a-z0-9]+"


def extract_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc rows) → one `term` row per token; lower-cased alnum runs, the
    same tokenizer as tfidf_top_terms so oracles line up."""
    return docs.select(
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TERM_RE), 0)).alias(
            "term"
        )
    )


def term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact (term, cnt): explode is map-local, the groupBy is the one
    shuffle (partial aggregation combines map-side)."""
    return extract_terms(docs, text_col).groupBy("term").agg(F.count("*").alias("cnt"))


def topk_terms(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Exact top-k most frequent terms, deterministic tie-break
    (cnt DESC, term ASC).  Plans as TakeOrderedAndProject (bounded
    per-partition top-k), never a global sort — asserted in tests."""
    return (
        term_counts(docs, text_col)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(k)
        .select("term", "cnt")
    )


def heavy_hitters_mg(terms: DataFrame, capacity: int = 64, term_col: str = "term") -> DataFrame:
    """Misra-Gries heavy-hitter summary of a term column.

    Per Arrow batch: count terms vectorized (pandas value_counts), then
    weighted-MG-compress to ≤ capacity counters (repeatedly subtract the
    smallest counter from all — the weighted decrement step).  Each batch
    emits ≤ capacity (term, lower-bound count) rows; one final groupBy
    merges them.  Output: (term, est_cnt) with est_cnt ≤ true count and
    every term of true frequency > N/capacity guaranteed present.
    """
    import pandas as pd

    def mg_batches(it):
        for pdf in it:
            vc = pdf[term_col].value_counts()
            # weighted Misra-Gries compression: while over capacity,
            # subtract the (len-capacity)-th largest count from all and
            # drop the non-positive tail (one vectorized pass — same
            # effect as repeated single decrements)
            if len(vc) > capacity:
                cut = vc.iloc[capacity]  # value_counts sorts desc: (cap+1)-th largest
                vc = (vc - cut)[lambda s: s > 0]
            if len(vc):
                yield pd.DataFrame({"term": vc.index, "est_cnt": vc.to_numpy()})

    summaries = terms.mapInPandas(mg_batches, "term string, est_cnt long")
    return summaries.groupBy("term").agg(F.sum("est_cnt").alias("est_cnt"))
