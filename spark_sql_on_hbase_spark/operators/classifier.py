"""Linear text classification as a broadcast-join inference pass —
the fastText-style quality/topic scorer every training-data pipeline
runs over its corpus (model inference expressed as relational algebra,
no Python in the loop).

Model shape: a bag of HASHED word uni+bigram features (feature id =
hash60(gram) mod n_features) and a weight table (feature_id, w_ppm)
with integer parts-per-million weights.  The logit is then

    logit_ppm = bias_ppm + Σ_f  w_ppm[f] · tf[f]

— an exact INTEGER sum, reproducible bit-for-bit by any engine (a
float weight vector would make the per-doc sum order-dependent in the
last ulps and break cross-engine verification; ppm quantization costs
nothing at classification precision).

Scale shape: tokenize/shingle/hash map-side; tf is one (doc, feature)
hash aggregation with map-side partial combine; the weight table is at
most ``n_features`` rows (2^18 default ≈ 262 k) — broadcast, exactly
like a fastText .bin rides along to every worker; the scoring sum keys
on the doc id alone.  Corpus text never shuffles.

Real checkpoints plug in by loading their quantized embedding/output
matrices into the weights DataFrame; ``make_hash_weights`` provides the
deterministic stand-in used by tests and the graded oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.functions.text import hash60, whitespace_tokens

N_FEATURES = 1 << 18

# at most one persisted per-doc bigram-count frame per SparkSession,
# keyed by the session object (see ngram_logprob)
_NGRAM_DCNT_CACHE: dict = {}


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = N_FEATURES,
) -> DataFrame:
    """(id, feature_id, tf) — hashed bag of word unigrams + bigrams.

    ONE corpus pass (r15): unigram and bigram arrays are concatenated
    per row and exploded once, instead of unioning two independent
    subtrees that each re-scan and re-tokenize the corpus (the gram
    multiset is identical, and the downstream count is order-blind).
    Shingling uses the native transform/slice/array_join expressions —
    measured FASTER than the ML ``NGram`` transformer here (0.36 s vs
    0.69 s wall on the sf0.1 gram stream) because the NGram UDF gets
    re-evaluated up to 3× per row once the optimizer pushes the
    explode's size/null filter through the projection (guide §4.4),
    while the native expressions stay inside whole-stage codegen.
    """
    from spark_sql_on_hbase_spark.functions.text import null_safe_tokens, word_ngrams
    from spark_sql_on_hbase_spark.operators.dedup import _spread

    wide = _spread(docs)
    # materialize the token array BEFORE shingling: passing the raw
    # split expression into word_ngrams would re-evaluate the tokenizer
    # on every element_at access inside the transform lambda (O(n²) per
    # row — measured 225 task-s vs 2 on the sf0.1 stream)
    toked = wide.select(
        F.col(id_col), null_safe_tokens(F.col(text_col)).alias("_toks")
    )
    grams = toked.select(
        F.col(id_col),
        F.explode(
            F.concat(F.col("_toks"), word_ngrams(F.col("_toks"), 2))
        ).alias("gram"),
    )
    return (
        grams.select(id_col, (hash60(F.col("gram")) % n_features).alias("feature_id"))
        .groupBy(id_col, "feature_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def make_hash_weights(spark, n_features: int = N_FEATURES) -> DataFrame:
    """Deterministic stand-in weight table: w_ppm(f) = (f mod 1001) - 500
    per-mille → ppm.  Pseudo-random in [-0.5, 0.5], derivable by any SQL
    engine from the feature id alone (no weight shipping needed for the
    oracle)."""
    return spark.range(n_features).select(
        F.col("id").alias("feature_id"),
        ((F.col("id") % 1001 - 500) * 1000).cast("long").alias("w_ppm"),
    )


def linear_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = N_FEATURES,
    bias_ppm: int = 0,
) -> DataFrame:
    """Score every document under a linear model over hashed features.

    Returns ``(id, n_features_hit, logit_ppm, prob)``: the exact integer
    logit (ppm) and the sigmoid probability (informational — float; the
    exact value to verify/compare on is ``logit_ppm``).  Features absent
    from ``weights`` contribute 0.
    """
    tf = hashed_features(docs, text_col, id_col, n_features)
    scored = tf.join(F.broadcast(weights), "feature_id", "left")
    # n_features_hit counts features PRESENT in the weight table (the
    # coverage signal a sparse real checkpoint needs); misses score 0
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.col("w_ppm")).alias("n_features_hit"),
        (
            F.sum(F.coalesce(F.col("w_ppm"), F.lit(0)) * F.col("tf"))
            + F.lit(int(bias_ppm))
        ).alias("logit_ppm"),
    )
    logit = F.col("logit_ppm") / 1000000.0
    return per_doc.select(
        F.col(id_col),
        F.col("n_features_hit"),
        F.col("logit_ppm").cast("bigint").alias("logit_ppm"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
    )


def ngram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: float = 0.5,
) -> DataFrame:
    """Perplexity-style quality scoring: mean bigram log-probability of
    each document under the corpus's own bigram model (add-k smoothing)
    — the KenLM-filter pattern with the model TRAINED ON and APPLIED TO
    the corpus in one relational plan.

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1·) + k·V),  V = distinct bigrams'
    prefix vocabulary; score = Σ ln P over the doc's bigram occurrences
    (``logprob_fp``, per-term 1e-6 fixed-point floors summed exactly so
    the value is engine-reproducible), plus the float mean for human use.

    Scale shape (r15): the raw bigram stream is tokenized/hashed ONCE —
    one map-side-combined aggregation to per-doc bigram counts
    ``d_cnt = (id, bgh, w1h, cnt)``, persisted so the model subtrees
    (bigram counts, prefix counts, vocabulary size) and the scoring join
    all read the compacted frame instead of re-running the
    tokenize→shingle→hash leaf (the pre-r15 plan scanned and re-hashed
    the corpus FOUR times; the persist is within one query execution and
    the bench clears the cache between timed runs).  Model size =
    distinct-bigram rows, joined back on the bigram hash — an equi-join
    that AQE broadcasts when the vocabulary fits, else a plain hash
    join.  Corpus text never shuffles; only hashes and counts move, and
    the per-occurrence sum becomes an exact cnt-weighted integer sum
    over distinct (doc, bigram) pairs — identical by distributivity.

    Returns (id, n_bigrams, logprob_fp, avg_logprob).
    """
    from spark_sql_on_hbase_spark.operators.dedup import _shingles, _spread

    bigrams = _shingles(_spread(docs), text_col, id_col, 2, distinct=False).select(
        F.col(id_col), F.col("s").alias("bg")
    ).select(
        id_col,
        hash60(F.col("bg")).alias("bgh"),
        hash60(F.split(F.col("bg"), " ").getItem(0)).alias("w1h"),
    )
    # w1h is functionally dependent on bgh (both hash the same bigram
    # text), so grouping by (id, bgh, w1h) equals grouping by (id, bgh)
    # (r15 review) cap the session-lifetime cache at ONE frame: each
    # call releases the PREVIOUS call's persisted d_cnt before
    # persisting its own (release-before-persist, because the
    # CacheManager uncaches by PLAN EQUALITY and back-to-back calls on
    # the same corpus build identical plans — the _TOS_SPANS_CACHE
    # lesson).  Without this, a long-lived session scoring N corpora
    # pinned N frames in storage memory forever.
    sess = docs.sparkSession
    prev = _NGRAM_DCNT_CACHE.pop(sess, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    d_cnt = bigrams.groupBy(id_col, "bgh", "w1h").agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    _NGRAM_DCNT_CACHE[sess] = d_cnt
    c_bg = d_cnt.groupBy("bgh").agg(
        F.sum("cnt").alias("c2"), F.first("w1h").alias("w1h")
    )
    c_w1 = c_bg.groupBy("w1h").agg(F.sum("c2").alias("c1"))
    vocab = c_bg.select(F.count(F.lit(1)).alias("v"))  # bgh already unique; 1 row
    model = (
        c_bg.join(c_w1, "w1h")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bgh",
            F.floor(
                F.log(
                    (F.col("c2") + F.lit(k_smooth))
                    / (F.col("c1") + F.lit(k_smooth) * F.col("v"))
                )
                * 1000000
            ).cast("long").alias("lp_fp"),
        )
    )
    scored = d_cnt.join(model, "bgh")  # every corpus bigram is in the model
    per_doc = scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(F.col("cnt") * F.col("lp_fp")).alias("logprob_fp"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.col("logprob_fp").cast("bigint").alias("logprob_fp"),
        # floor convention, not round(): see quality_score's note on
        # cross-engine HALF_UP drift at exact-decimal boundaries
        (F.floor(F.col("logprob_fp") / 1000000.0 / F.col("n_bigrams") * 10000) / 10000).alias(
            "avg_logprob"
        ),
    )
