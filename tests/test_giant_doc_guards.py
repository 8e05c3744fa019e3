"""r8 (VERDICT r7 #7): explicit giant-input bounds — strip_spans'
per-document reassembly group and pack_greedy's per-group task are both
one-row/one-task shapes under pathological inputs; the guards turn the
silent straggler into a clear error.
"""

import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.operators.packing import pack_greedy
from spark_sql_on_hbase_spark.operators.text_analysis import (
    duplicated_spans,
    strip_spans,
)


def _docs(spark, skew_tokens=0):
    rows = [
        (1, "alpha beta gamma delta " * 3),
        (2, "alpha beta gamma delta " * 3),
        (3, "unrelated words here entirely different content stream"),
    ]
    if skew_tokens:
        rows.append((4, "tok " * skew_tokens))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_spans_guard_raises_on_giant_doc(spark):
    docs = _docs(spark, skew_tokens=500)
    spans = duplicated_spans(docs, k=4, min_docs=2)
    with pytest.raises(Exception, match="max_tokens"):
        strip_spans(docs, spans, max_tokens=100).collect()


def test_strip_spans_guard_passes_within_bound(spark):
    docs = _docs(spark)
    spans = duplicated_spans(docs, k=4, min_docs=2)
    guarded = strip_spans(docs, spans, max_tokens=1000).orderBy("doc_id").collect()
    plain = strip_spans(docs, spans).orderBy("doc_id").collect()
    assert [tuple(r) for r in guarded] == [tuple(r) for r in plain]
    assert len(guarded) == 3


def test_pack_greedy_guard_raises_on_giant_group(spark):
    df = spark.range(200).select(
        F.lit("g").alias("grp"), F.col("id").alias("ord"), F.lit(10).alias("sz")
    )
    with pytest.raises(Exception, match="max_group_rows"):
        pack_greedy(df, "grp", "ord", "sz", budget=64, max_group_rows=50).collect()


def test_pack_greedy_guard_passes_within_bound(spark):
    df = spark.range(40).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.col("id").alias("ord"),
        F.lit(10).alias("sz"),
    )
    guarded = pack_greedy(df, "grp", "ord", "sz", budget=35, max_group_rows=50)
    plain = pack_greedy(df, "grp", "ord", "sz", budget=35)
    a = sorted(tuple(r) for r in guarded.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b and len(a) == 40
