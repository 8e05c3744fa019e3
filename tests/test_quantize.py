"""Embedding scalar quantization (operators/quantize.py): reconstruction
error bound, DuckDB arithmetic parity, pure-codegen plan shape, and
quantized-score→exact-rerank retrieval quality vs the exact brute force."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.operators.quantize import (
    dequantize,
    quantized_topk,
    scalar_quantize,
)

SF = "/root/testdata/sf0.001"
EMB_PQ = f"{SF}/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB_PQ)


def test_roundtrip_error_within_half_step(spark, emb):
    """|x - x̂| ≤ span/2 + eps per dimension (the scalar-quantizer bound)."""
    deq = dequantize(scalar_quantize(emb), out_col="hat")
    bad = deq.select(
        F.aggregate(
            F.zip_with("embedding", "hat", lambda x, h: F.abs(x - h)),
            F.lit(0.0),
            lambda acc, e: F.greatest(acc, e),
        ).alias("max_err"),
        (F.col("qcode_span") / 2 + F.lit(1e-9)).alias("bound"),
    ).filter(F.col("max_err") > F.col("bound"))
    assert bad.count() == 0


def test_constant_vector_reconstructs_exactly(spark):
    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5]), (2, None)], "vec_id int, embedding array<double>"
    )
    out = dequantize(scalar_quantize(df), out_col="hat").collect()
    r1 = [r for r in out if r.vec_id == 1][0]
    assert r1.hat == [2.5, 2.5, 2.5] and r1.qcode == [0, 0, 0]
    r2 = [r for r in out if r.vec_id == 2][0]
    assert r2.qcode is None and r2.hat is None


def test_codes_match_duckdb_arithmetic(spark, emb):
    """The code assignment is engine-reproducible: DuckDB computes the
    identical floor((x-min)/span + 0.5) codes from the same parquet."""
    got = {
        r.vec_id: r.qcode
        for r in scalar_quantize(emb).select("vec_id", "qcode").collect()
    }
    want = {
        vid: code
        for vid, code in duckdb.sql(
            f"""
            SELECT vec_id,
                   CASE WHEN mx > mn THEN
                     list_transform(embedding, x -> CAST(floor(
                       (CAST(x AS DOUBLE) - mn)
                       / ((mx - mn) / CAST(255.0 AS DOUBLE))
                       + 0.5) AS SMALLINT))
                   ELSE list_transform(embedding, x -> CAST(0 AS SMALLINT)) END AS qcode
            FROM (SELECT vec_id, embedding,
                         CAST(list_min(embedding) AS DOUBLE) AS mn,
                         CAST(list_max(embedding) AS DOUBLE) AS mx
                  FROM '{EMB_PQ}')
            """
        ).fetchall()
    }
    assert got == want


def test_quantize_plan_is_pure_codegen(spark, emb):
    """No Python/Arrow eval in the quantize/dequantize plan — the property
    that makes re-encoding a 100 TB corpus a scan-speed linear pass."""
    plan = dequantize(scalar_quantize(emb), out_col="hat")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # neither BatchEvalPython nor ArrowEvalPython


def test_quantized_topk_recall_vs_exact(spark, emb):
    from spark_sql_on_hbase_spark.operators.similarity import knn_bruteforce

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = knn_bruteforce(emb, queries, k=5)
    quant = quantized_topk(emb, queries, k=5, rerank=25)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & q) / len(e)
    # 8-bit codes + 5x rerank headroom recover the exact top-5 nearly
    # always; the floor guards against borderline ties
    assert recall >= 0.8, recall


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_roundtrip_property_random_vectors(spark):
    """Property test: for arbitrary float vectors (negatives, tiny spans,
    huge magnitudes), reconstruction stays within half a quantization
    step per dimension."""
    from hypothesis import given, settings, strategies as st


    finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.lists(finite, min_size=1, max_size=16), min_size=1, max_size=8))
    def check(vecs):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id int, embedding array<double>",
        )
        out = dequantize(scalar_quantize(df), out_col="hat").collect()
        for r in out:
            span = (max(r.embedding) - min(r.embedding)) / 255.0
            for x, h in zip(r.embedding, r.hat):
                assert abs(x - h) <= span / 2 + 1e-6 * max(1.0, abs(x)), (x, h, span)

    check()
