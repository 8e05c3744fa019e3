"""Salted join: row-for-row parity with the plain join under skew."""

from __future__ import annotations

import random

import pytest

from spark_sql_on_hbase_spark.operators.skew import salted_join


def _mk_skewed(spark, seed=3):
    rng = random.Random(seed)
    # one hot key carrying 70% of rows + a uniform tail
    left = [("hot" if rng.random() < 0.7 else f"k{rng.randrange(20)}", i, rng.randrange(100))
            for i in range(600)]
    right = [(f"k{j}", j * 10) for j in range(20)] + [("hot", 999), ("hot", 1000), ("ronly", 1)]
    ldf = spark.createDataFrame(left, "k string, lid long, lv long")
    rdf = spark.createDataFrame(right, "k string, rv long")
    return ldf, rdf


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("buckets", [1, 4, 16])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, buckets, how):
    ldf, rdf = _mk_skewed(spark)
    plain = ldf.join(rdf, ["k"], how)
    salted = salted_join(ldf, rdf, ["k"], buckets=buckets, how=how)
    assert salted.columns == plain.columns
    assert _rows(salted) == _rows(plain)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_hot_keys_only(spark, how):
    ldf, rdf = _mk_skewed(spark)
    hot = spark.createDataFrame([("hot",)], "k string")
    plain = ldf.join(rdf, ["k"], how)
    salted = salted_join(ldf, rdf, ["k"], buckets=8, hot_keys=hot, how=how)
    assert _rows(salted) == _rows(plain)


def test_salted_join_spreads_hot_key(spark):
    ldf, rdf = _mk_skewed(spark)
    # the salted left side must place the hot key in >1 bucket
    from pyspark.sql import functions as F

    spread = ldf.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in ldf.columns]), F.lit(8))
    )
    n = spread.filter("k = 'hot'").select("__salt").distinct().count()
    assert n > 1


def test_salted_join_multi_column_key(spark):
    rows_l = [(i % 3, f"s{i % 2}", i) for i in range(100)]
    rows_r = [(a, f"s{b}", a * 100 + b) for a in range(3) for b in range(2)]
    ldf = spark.createDataFrame(rows_l, "a int, b string, lid long")
    rdf = spark.createDataFrame(rows_r, "a int, b string, rv long")
    hot = spark.createDataFrame([(0, "s0")], "a int, b string")
    plain = ldf.join(rdf, ["a", "b"], "inner")
    salted = salted_join(ldf, rdf, ["a", "b"], buckets=4, hot_keys=hot)
    assert _rows(salted) == _rows(plain)


def test_salted_join_deterministic(spark):
    ldf, rdf = _mk_skewed(spark)
    a = _rows(salted_join(ldf, rdf, ["k"], buckets=8))
    b = _rows(salted_join(ldf.repartition(5), rdf, ["k"], buckets=8))
    assert a == b
