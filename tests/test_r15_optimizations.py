"""r15 optimization round: focused pins for the operator internals the
round restructured.  Each test pins the NEW mechanism (single-pass gram
streams, metadata-grain span strip, two-level distinct aggregations,
scale-adaptive spread, all-zero-band codec fast paths) against
independently computed expected values — semantics stay covered by the
oracle harness; these guard the specific r15 rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _naive_ngrams(tokens: list[str], n: int) -> list[str]:
    return (
        [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
        if len(tokens) >= n
        else []
    )


def test_word_ngrams_matches_naive_reference(spark):
    """The transform/element_at rewrite must emit exactly the old
    slice/array_join (and ML NGram) strings for every n and edge case."""
    from spark_sql_on_hbase_spark.functions.text import word_ngrams

    rows = [
        ("a b c d e",),
        ("one",),
        ("",),  # split('') -> [''] single empty token
        ("x  y",),  # double space -> empty middle token
        ("a b",),
    ]
    import re

    df = spark.createDataFrame(rows, ["text"]).select(
        F.split(F.lower("text"), r"\s+").alias("_toks")
    )
    for n in (2, 3, 4):
        got = [r[0] for r in df.select(word_ngrams(F.col("_toks"), n)).collect()]
        # reference tokenizer = the same regex split Spark applies
        exp = [_naive_ngrams(re.split(r"\s+", t[0].lower()), n) for t in rows]
        assert got == exp, (n, got, exp)


def test_strip_spans_interval_semantics(spark):
    """Doc-grain interval strip: overlapping spans, spans past the doc
    end, NULL bounds, and untouched docs all match the old
    position-explode semantics."""
    from spark_sql_on_hbase_spark.operators.text_analysis import strip_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z"), (3, "solo"), (4, None)],
        ["doc_id", "text"],
    )
    spans = spark.createDataFrame(
        [
            (1, 2, 3),  # strips b c
            (1, 3, 5),  # overlaps: strips d e too (c double-covered once)
            (2, 3, 9),  # runs past the end: strips z only
            (3, None, None),  # NULL bounds flag nothing
        ],
        "doc_id long, span_start long, span_end long",
    )
    out = {r.doc_id: r for r in strip_spans(docs, spans).collect()}
    assert out[1].clean_text == "a f" and out[1].n_removed == 4
    assert out[2].clean_text == "x y" and out[2].n_removed == 1
    assert out[3].clean_text == "solo" and out[3].n_removed == 0
    assert out[4].clean_text == "" and out[4].n_removed == 0
    assert len(out) == 4  # every doc reported


def test_contamination_flags_no_expand(spark):
    """The two-level rewrite must not plan an Expand (the old double
    countDistinct did), and counts must match hand-computed values."""
    from spark_sql_on_hbase_spark.operators.decontam import contamination_flags

    corpus = spark.createDataFrame(
        [(1, "p q r s p q r s"), (2, "a b c d"), (3, "x")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(10, "p q r s")], ["doc_id", "text"])
    out = contamination_flags(corpus, bench, n=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    rows = {r.doc_id: r for r in out.collect()}
    # doc 1: 8 tokens -> 5 occurrences but distinct 4-grams: "p q r s",
    # "q r s p", "r s p q", "s p q r" and again "p q r s" -> 4 distinct
    assert rows[1].n_grams == 4 and rows[1].n_hits == 1
    assert rows[1].contaminated  # any shared gram at max_hit_ratio=0
    assert rows[2].n_grams == 1 and rows[2].n_hits == 0
    assert rows[3].n_grams == 0 and rows[3].n_hits == 0 and not rows[3].contaminated


def test_duplicated_spans_two_level_counts(spark):
    """Two-level (gh, doc) aggregation reproduces the distinct-doc and
    total-occurrence semantics, including self_repeats."""
    from spark_sql_on_hbase_spark.operators.text_analysis import duplicated_spans

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 a b c"),
            (2, "lead " + shared),
            (3, "self " + shared + " mid " + shared),
        ],
        ["doc_id", "text"],
    )
    spans = duplicated_spans(docs, k=8, min_docs=2)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    assert (1, 1, 8) in got and (2, 2, 9) in got
    # within-doc repeat alone must NOT mark without self_repeats: doc 3's
    # two copies both match docs 1/2's gram anyway, so both appear
    assert any(d == 3 for d, _s, _e in got)


def test_fingerprint_text_hash_hoisted(spark):
    """text_hash equals hash60(full text) exactly once per doc, and the
    shingle stats match a hand count."""
    from spark_sql_on_hbase_spark.operators.text_analysis import fingerprint

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in fingerprint(docs, shingle_n=3).collect()}
    # doc 1: 4 shingles, distinct {"a b c","b c a","c a b"} -> 3
    assert out[1].n_shingles == 3
    assert 2 not in out  # shorter than n -> absent (explode, not outer)
    import hashlib

    exp = int(hashlib.md5("a b c a b c".encode()).hexdigest()[:15], 16)
    assert out[1].text_hash == exp


def test_repetition_single_pass_parity(spark):
    """Tagged single-pass stream: hand-checked ratios, incl. the NULL and
    single-token docs whose old per-branch outer rows are now one row."""
    from spark_sql_on_hbase_spark.operators.text_analysis import repetition_signals

    docs = spark.createDataFrame(
        [(1, "x x x x y"), (2, "solo"), (3, None)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert out[1].n_tokens == 5
    assert out[1].max_token_frac == 0.8
    # bigrams: "x x" ×3, "x y" ×1 -> dup occurrences 3 of 4
    assert out[1].dup_2gram_frac == 0.75
    assert out[1].repetitive
    assert out[2].n_tokens == 1 and out[2].dup_2gram_frac == 0.0
    assert out[3].n_tokens == 0 and not out[3].repetitive
    assert len(out) == 3


def test_hashed_features_single_pass_counts(spark):
    """One-explode gram stream = unigram+bigram multiset union."""
    from spark_sql_on_hbase_spark.operators.classifier import hashed_features

    docs = spark.createDataFrame([(7, "a b a")], ["doc_id", "text"])
    tf = hashed_features(docs, n_features=1 << 16).collect()
    # grams: a, b, a, "a b", "b a" -> 5 occurrences, 4 distinct features
    assert sum(r.tf for r in tf) == 5
    assert len(tf) == 4


def test_spread_is_scale_adaptive(spark, monkeypatch, tmp_path):
    """Sub-chunk inputs stay narrow; the cap remains defaultParallelism."""
    from spark_sql_on_hbase_spark.operators.dedup import _spread

    df = spark.range(1000).selectExpr("id", "repeat('x', 10) AS text")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_CHUNK_KB", "1024")
    narrow = _spread(back)
    assert narrow.rdd.getNumPartitions() <= 2  # tiny file: no 32-way blast
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_CHUNK_KB", "1")
    wide = _spread(back)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_ngram_logprob_weighted_sum_identity(spark):
    """cnt-weighted integer sums over the persisted pair frame equal the
    per-occurrence formulation on a corpus with repeated bigrams."""
    from spark_sql_on_hbase_spark.operators.classifier import ngram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in ngram_logprob(docs).collect()}
    import math

    # corpus bigrams: doc1: "a b"×3, "b a"×2; doc2: "a b", "b c"
    # c2: ab=4, ba=2, bc=1; prefixes: a·=4? no: w1 of ab is a (c1 over
    # bigrams grouped by w1 of their own bg): a: ab=4 -> 4; b: ba=2,bc=1 -> 3
    V = 3
    lp = {
        "ab": math.floor(math.log((4 + 0.5) / (4 + 0.5 * V)) * 1e6),
        "ba": math.floor(math.log((2 + 0.5) / (3 + 0.5 * V)) * 1e6),
        "bc": math.floor(math.log((1 + 0.5) / (3 + 0.5 * V)) * 1e6),
    }
    assert out[1].n_bigrams == 5
    assert out[1].logprob_fp == 3 * lp["ab"] + 2 * lp["ba"]
    assert out[2].n_bigrams == 2
    assert out[2].logprob_fp == lp["ab"] + lp["bc"]


def test_ngram_logprob_caps_cache_at_one_frame(spark):
    """r15 review: ngram_logprob persisted d_cnt and never released it
    — one leaked cached frame per call in a long-lived session.  Each
    call must release the previous call's frame (BEFORE persisting its
    own, the plan-equality lesson) so the session-lifetime cache stays
    at one frame, and results stay identical call-over-call."""
    from spark_sql_on_hbase_spark.operators.classifier import (
        _NGRAM_DCNT_CACHE,
        ngram_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    spark.catalog.clearCache()
    try:
        first = {r.doc_id: r.logprob_fp for r in ngram_logprob(docs).collect()}
        jsm = spark._jsparkSession.sharedState().cacheManager()
        assert not jsm.isEmpty()
        for _ in range(3):
            again = {r.doc_id: r.logprob_fp for r in ngram_logprob(docs).collect()}
            assert again == first
        # one live entry per session, not one per call
        n_cached = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        assert n_cached <= 1, n_cached
        assert spark in _NGRAM_DCNT_CACHE
    finally:
        prev = _NGRAM_DCNT_CACHE.pop(spark, None)
        if prev is not None:
            prev.unpersist(blocking=False)
        spark.catalog.clearCache()


def test_progressive_codec_fast_path_roundtrip():
    """All-zero-band fast paths: images mixing flat regions (all-zero
    bands), dense ACs, and tiny ACs that vanish under the point
    transform (c >> al == 0 -> slow path) all survive the progressive
    encode/decode round trip pixel-exactly vs the sequential decode of
    the baseline encode of the same plane."""
    import numpy as np

    from spark_sql_on_hbase_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    flat = np.full((24, 24), 128, dtype=np.uint8)
    noisy = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    tiny = (128 + (rng.integers(0, 3, size=(24, 24)) - 1)).astype(np.uint8)
    for img in (flat, noisy, tiny):
        base = decode_jpeg(encode_jpeg_gray(img))
        prog = decode_jpeg(encode_jpeg_progressive(img))
        assert base is not None and prog is not None
        assert (base["pixels"] == prog["pixels"]).all()


def test_text_ops_span_cache_survives_repeat_calls(spark):
    """The shared span frame must still be SERVED FROM CACHE on the
    second and later suite calls in one session: CacheManager uncaches
    by plan equality, so releasing the previous call's (plan-identical)
    frame after persisting the new one evicted the new entry too, and
    every bench call past the first recomputed the extraction once per
    consuming branch (r15 fix: release prev BEFORE persist)."""
    from spark_sql_on_hbase_spark.queries_pipeline import (
        _TOS_SPANS_CACHE,
        _text_ops_branches,
    )

    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    try:
        for _call in (1, 2):
            branches = _text_ops_branches(spark, sf)
            spans = branches["dupspans"]
            plan = spans._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan, (
                f"call {_call}: span frame not cached\n{plan[:500]}"
            )
            # and the OTHER consumer reads the same cache
            strip_plan = (
                branches["spanstrip"]._jdf.queryExecution().executedPlan().toString()
            )
            assert "InMemoryTableScan" in strip_plan, f"call {_call}"
    finally:
        prev = _TOS_SPANS_CACHE.pop(spark, None)
        if prev is not None:
            prev.unpersist(blocking=False)
        spark.catalog.clearCache()


def test_quantize_zipwith_shape_edge_parity(spark):
    """The zip_with/array_repeat rewrite (per-row min/span evaluated in
    ARGUMENT position instead of per-element lambda captures) must keep
    the exact pre-rewrite semantics on the edges the property tests skip:
    NULL vectors, empty vectors, and constant vectors."""
    import math

    from spark_sql_on_hbase_spark.operators.quantize import (
        dequantize,
        scalar_quantize,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, [5.0, 5.0]),  # constant -> all-zero codes, span 0
            (3, []),  # empty -> empty codes
            (4, None),  # NULL -> NULL codes, NULL hat
        ],
        "vec_id int, embedding array<double>",
    )
    rows = {
        r.vec_id: r
        for r in dequantize(scalar_quantize(df), out_col="hat").collect()
    }
    # reference arithmetic: floor((x - mn)/span + 0.5); mn + c*span
    mn, span = 1.0, (3.0 - 1.0) / 255.0
    assert rows[1].qcode == [
        int(math.floor((x - mn) / span + 0.5)) for x in [1.0, 2.0, 3.0]
    ]
    assert rows[1].hat == [mn + c * span for c in rows[1].qcode]
    assert rows[2].qcode == [0, 0] and rows[2].qcode_span == 0.0
    assert rows[2].hat == [5.0, 5.0]
    assert rows[3].qcode == [] and rows[3].hat == []
    assert rows[4].qcode is None and rows[4].hat is None
