"""r8 review #2/#3: engine vs oracle parity on NULL-text documents for
the new chunking and BMP entries — the graded corpus currently has no
NULL-text rows, so this pins the latent contract directly: the oracle
SQL evaluated in DuckDB over a synthetic corpus WITH a NULL row must
match the operators run on the same rows.
"""

import duckdb
import pytest

from spark_sql_on_hbase_spark.operators.multimodal import (
    encode_bmp_column,
    image_pixel_stats,
)
from spark_sql_on_hbase_spark.operators.text_analysis import chunk_documents
from spark_sql_on_hbase_spark.queries_pipeline import (
    _BMP_ORACLE_BODY,
    _CHUNK_ORACLE_BODY,
)

_ROWS = [
    (0, "alpha beta gamma " * 30),
    (1, None),
    (2, ""),
    (3, "one"),
]


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for rid, t in _ROWS:
        c.execute("INSERT INTO documents VALUES (?, ?)", [rid, t])
    return c


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_chunk_oracle_parity_with_null_text(spark, con):
    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    got = chunk_documents(docs, chunk_tokens=32, stride=24).collect()
    want = con.execute(_CHUNK_ORACLE_BODY).fetchall()
    assert _norm(got) == _norm(want)
    # the NULL-text doc yields exactly one EMPTY chunk on both sides
    nulls = [r for r in got if r.doc_id == 1]
    assert [(r.chunk_id, r.chunk_text, r.n_tokens, r.start_pos) for r in nulls] == [
        (0, "", 0, 1)
    ]


def test_bmp_oracle_parity_with_null_text(spark, con):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(_ROWS, "doc_id long, text string")
    df = docs.withColumn("blob", F.col("text").cast("binary")).select("doc_id", "blob")
    got = image_pixel_stats(
        encode_bmp_column(df, width=16).select("doc_id", "bmp"), "bmp"
    ).collect()
    want = con.execute(_BMP_ORACLE_BODY).fetchall()
    assert _norm(got) == _norm(want)
    nulls = [tuple(r)[1:] for r in got if r.doc_id == 1]
    assert nulls == [(None,) * 6]  # all-NULL stats for the NULL blob
