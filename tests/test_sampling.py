"""Deterministic sampling / split assignment + text normalize/redact."""

from __future__ import annotations

import hashlib
import re

import pytest

from spark_sql_on_hbase_spark.functions.text import (
    REDACT_PATTERN,
    normalize_ws,
    redact_sensitive,
)
from spark_sql_on_hbase_spark.operators.sampling import (
    RESOLUTION,
    assign_split,
    hash_sample,
    stratified_sample,
)


def _bucket(salt: str, key) -> int:
    h = int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)
    return h % RESOLUTION


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i}", ["en", "de", "fr"][i % 3]) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_sample_exact_membership(spark, docs):
    kept = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    exp = {i for i in range(500) if _bucket("smp", i) < 200_000}
    assert kept == exp
    assert 0.10 < len(kept) / 500 < 0.30  # rate sanity


def test_hash_sample_deterministic_across_runs(spark, docs):
    a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect())
    assert a == b


def test_hash_sample_is_mapside_only(spark, docs):
    plan = hash_sample(docs, "doc_id", 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter, no shuffle


def test_assign_split_partition_and_consistency(spark, docs):
    out = assign_split(docs, "doc_id").collect()
    assert len(out) == 500
    for r in out:
        b = _bucket("spl", r.doc_id)
        exp = "train" if b < 800_000 else ("val" if b < 900_000 else "test")
        assert r.split == exp
    # consistency: another table keyed by the same entity gets same split
    other = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    m = {r.doc_id: r.split for r in assign_split(other, "doc_id").collect()}
    for r in out:
        assert m[r.doc_id] == r.split


def test_assign_split_weights_validated(spark, docs):
    with pytest.raises(AssertionError):
        assign_split(docs, "doc_id", weights={"a": 0.5, "b": 0.1})


def test_stratified_sample_rates_and_default(spark, docs):
    got = {
        (r.doc_id, r.lang)
        for r in stratified_sample(
            docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_rate=0.0
        ).collect()
    }
    exp = set()
    for i in range(500):
        lang = ["en", "de", "fr"][i % 3]
        thresh = {"en": 500_000, "de": 100_000}.get(lang, 0)
        if _bucket("str", i) < thresh:
            exp.add((i, lang))
    assert got == exp
    assert not any(lang == "fr" for _, lang in got)


def test_stratified_sample_broadcasts_rates(spark, docs):
    plan = (
        stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_normalize_and_redact(spark):
    rows = [
        (1, "  Hello   WORLD \t x  "),
        (2, "mail me at Bob.Smith+1@example.COM now"),
        (3, "see https://ex.com/a?b=1 and 12345 items"),
        (4, "plain text only"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r.id: (r.n, r.r)
        for r in df.select(
            "id",
            normalize_ws("t").alias("n"),
            redact_sensitive(normalize_ws("t")).alias("r"),
        ).collect()
    }
    assert out[1] == ("hello world x", "hello world x")
    assert out[2][0] == "mail me at bob.smith+1@example.com now"
    assert out[2][1] == "mail me at # now"
    assert out[3][1] == "see # and # items"
    assert out[4] == ("plain text only", "plain text only")
    # the pattern itself is RE2-safe: python re (closest local proxy)
    # compiles it and agrees on the masked form
    for _, (n, r) in out.items():
        assert re.sub(REDACT_PATTERN, "#", n) == r


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Near-duplicate documents must land in the SAME split — the
    eval-contamination guard a per-doc hash split cannot give."""
    from spark_sql_on_hbase_spark.operators.sampling import leakage_safe_split

    rows = [(i, f"totally unique document number {i} with filler words") for i in range(40)]
    rows += [(100, "the quick brown fox jumps over the lazy dog"),
             (101, "the quick brown fox jumps over the lazy dog"),   # exact dup
             (102, "the quick brown fox jumps over the sleepy dog")]  # near dup
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in leakage_safe_split(docs).collect()}
    assert len(out) == 43  # every doc split exactly once
    # the exact-dup pair shares one representative and therefore one split
    # (102's jaccard ≈ 0.55 sits below the 16/4 banding threshold ≈ 0.71,
    # so it is correctly NOT merged at the default sensitivity)
    assert out[100].split_key == out[101].split_key == 100
    assert out[100].split == out[101].split
    # deterministic across re-runs
    again = {r.doc_id: r.split for r in leakage_safe_split(docs).collect()}
    assert again == {k: v.split for k, v in out.items()}
