"""r15 (VERDICT r14 #2) — catalog-managed vector indexes.

`CREATE VECTOR INDEX ON t (emb) USING {IVF|PQ|IVFPQ} [OPTIONS(...)]`
promotes the path-addressed ANN builders to DDL-registered table
indexes: TableMeta registration, append-triggered incremental
maintenance with the existing drift guards, staleness + drift in
DESCRIBE EXTENDED, DROP/REINDEX cascade — the scalar index surface's
lifecycle (reference analog: HBaseSQLParser.scala:180-232) extended to
the ANN operators.  Vector columns (array<float|double>) are new
non-key, binaryformat-only column types stored as native parquet lists.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.session import AstroSession

D = 16
N = 120

DDL = (
    "CREATE TABLE vt (id LONG, tag STRING, emb ARRAY<DOUBLE>, "
    "PRIMARY KEY (id)) "
    "MAPPED BY (vt_ht, COLS=[tag=f.t, emb=f.e]) OPTIONS (regions=4)"
)


def _vecs(rng, n, start=0):
    return [
        (start + i, f"t{start + i}", [float(x) for x in rng.randn(D)])
        for i in range(n)
    ]


@pytest.fixture()
def astro(spark, tmp_path):
    a = AstroSession(spark, str(tmp_path / "vt_wh"))
    a.sql(DDL)
    rng = np.random.RandomState(7)
    df = spark.createDataFrame(
        _vecs(rng, N), "id long, tag string, emb array<double>"
    )
    a.relation("vt").write(df)
    return a


def _brute_topk(astro, qvec, k):
    """Ground truth by exact cosine over the resolved table."""
    rows = astro.relation("vt").scan().select("id", "emb").collect()
    q = np.asarray(qvec)
    scored = []
    for r in rows:
        v = np.asarray(r.emb)
        cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        scored.append((round(cos, 4), r.id))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [i for _c, i in scored[:k]]


def test_ivf_full_probe_matches_brute_force(astro, spark):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    rel = astro.relation("vt")
    assert rel.meta.vector_indexes["emb"]["kind"] == "ivf"
    assert rel.meta.vector_indexes["emb"]["stale"] is False
    qrow = rel.scan().filter("id = 3").select("emb").collect()[0]
    q = spark.createDataFrame(
        [(3, qrow.emb)], "query_id long, emb array<double>"
    )
    # nprobe = ncentroids probes every list → exact
    got = rel.vector_topk(q, k=5, nprobe=8)
    ids = [r.neighbor_id for r in got.orderBy("rank").collect()]
    want = [i for i in _brute_topk(astro, qrow.emb, 6) if i != 3][:5]
    assert ids == want


def test_append_maintains_index_and_records_drift(astro, spark):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    # plant a twin of row 5 in the appended batch
    rng = np.random.RandomState(8)
    rel = astro.relation("vt")
    base5 = rel.scan().filter("id = 5").select("emb").collect()[0].emb
    twin = [x + 1e-4 for x in base5]
    batch = _vecs(rng, 10, start=1000) + [(2000, "twin", twin)]
    spark.createDataFrame(
        batch, "id long, tag string, emb array<double>"
    ).createOrReplaceTempView("vt_batch")
    astro.sql("INSERT INTO vt SELECT id, tag, emb FROM vt_batch")
    rel = astro.relation("vt")
    info = rel.meta.vector_indexes["emb"]
    assert info["stale"] is False
    assert info["drift"] and "ivf" in info["drift"]
    assert info["drift"]["ivf"]["appended"] == 11
    assert info["drift"]["ivf"]["retrain_recommended"] in (True, False)
    # the appended twin is found through the index (full probe = exact)
    q = spark.createDataFrame([(5, base5)], "query_id long, emb array<double>")
    got = rel.vector_topk(q, k=1, nprobe=8)
    assert [r.neighbor_id for r in got.collect()] == [2000]
    # DESCRIBE EXTENDED surfaces registration + drift
    out = astro.sql("DESCRIBE EXTENDED vt")
    text = "\n".join(" | ".join(str(c) for c in r) for r in out.collect())
    assert "vector_index.emb" in text and "IVF" in text
    assert "retrain=" in text


def test_ivf_probe_reads_only_probed_partitions(astro, spark):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    from spark_sql_on_hbase_spark.plans.metrics import scan_partition_files

    rel = astro.relation("vt")
    qrow = rel.scan().filter("id = 3").select("emb").collect()[0]
    q = spark.createDataFrame([(3, qrow.emb)], "query_id long, emb array<double>")
    df = rel.vector_topk(q, k=3, nprobe=2)
    df.write.mode("overwrite").format("noop").save()
    vidx = os.path.basename(rel.vector_index_path("emb"))
    parts, _files = scan_partition_files(df, f"{vidx}/assign")
    assert parts == 2, parts  # only the probed lists' directories


def test_fold_marks_stale_reindex_rebuilds(astro, spark):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    astro.sql("DELETE FROM vt WHERE id < 10")
    rel = astro.relation("vt")
    info = rel.meta.vector_indexes["emb"]
    assert info["stale"] is True
    qrow = rel.scan().filter("id = 20").select("emb").collect()[0]
    q = spark.createDataFrame([(20, qrow.emb)], "query_id long, emb array<double>")
    with pytest.raises(ValueError, match="STALE"):
        rel.vector_topk(q, k=3, nprobe=8)
    out = astro.sql("DESCRIBE EXTENDED vt")
    text = "\n".join(" | ".join(str(c) for c in r) for r in out.collect())
    assert "STALE" in text
    msg = astro.sql("REINDEX TABLE vt").collect()[0][0]
    assert "vector" in msg
    rel = astro.relation("vt")
    assert rel.meta.vector_indexes["emb"]["stale"] is False
    got = rel.vector_topk(q, k=3, nprobe=8)
    ids = [r.neighbor_id for r in got.orderBy("rank").collect()]
    want = [i for i in _brute_topk(astro, qrow.emb, 4) if i != 20][:3]
    assert ids == want  # deleted ids are gone from the rebuilt index


def test_mergefree_compact_preserves_freshness(astro):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    rel = astro.relation("vt")
    assert not rel.needs_merge()
    astro.sql("COMPACT TABLE vt")
    rel = astro.relation("vt")
    assert rel.meta.vector_indexes["emb"]["stale"] is False


def test_pq_and_ivfpq_kinds_serve(astro, spark):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING PQ "
        "OPTIONS(m=4, ksub=8, trained=false)"
    )
    rel = astro.relation("vt")
    qrow = rel.scan().filter("id = 3").select("emb").collect()[0]
    q = spark.createDataFrame([(3, qrow.emb)], "query_id long, emb array<double>")
    got = rel.vector_topk(q, k=1, rerank=40)
    # rerank-exact must find the true nearest neighbor (query id 3 is
    # excluded by the self-filter, so the truth is brute-force rank 2)
    assert [r.neighbor_id for r in got.collect()] == _brute_topk(
        astro, qrow.emb, 2
    )[1:2]
    astro.sql("DROP VECTOR INDEX ON vt (emb)")
    rel = astro.relation("vt")
    assert not rel.meta.vector_indexes
    assert not os.path.isdir(rel.vector_index_path("emb"))
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVFPQ "
        "OPTIONS(ncentroids=8, m=4, ksub=8, trained=false)"
    )
    rel = astro.relation("vt")
    got = rel.vector_topk(q, k=3, nprobe=8, rerank=40)
    assert got.count() == 3


def test_validation_errors(astro, spark, tmp_path):
    with pytest.raises(ValueError, match="not a vector column"):
        astro.sql("CREATE VECTOR INDEX ON vt (tag) USING IVF")
    with pytest.raises(ValueError, match="not index-keyable"):
        astro.sql("CREATE INDEX ON vt (emb)")
    with pytest.raises(ValueError, match="binaryformat"):
        astro.sql(
            "CREATE TABLE vsf (id LONG, emb ARRAY<DOUBLE>, PRIMARY KEY (id)) "
            "MAPPED BY (vsf_ht, COLS=[emb=f.e]) IN STRINGFORMAT"
        )
    with pytest.raises(ValueError, match="key columns"):
        astro.sql(
            "CREATE TABLE vk (emb ARRAY<DOUBLE>, v INT, PRIMARY KEY (emb)) "
            "MAPPED BY (vk_ht, COLS=[v=f.v])"
        )
    csv = tmp_path / "v.csv"
    csv.write_text("1,a,b\n")
    with pytest.raises(ValueError, match="vector columns"):
        astro.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE vt")
    # composite-key tables decline (no single integer row id)
    astro.sql(
        "CREATE TABLE vc (k1 INT, k2 INT, emb ARRAY<DOUBLE>, "
        "PRIMARY KEY (k1, k2)) MAPPED BY (vc_ht, COLS=[emb=f.e])"
    )
    with pytest.raises(ValueError, match="single integer"):
        astro.sql("CREATE VECTOR INDEX ON vc (emb) USING IVF")


def test_drop_table_cascades_vector_index_dir(astro, spark):
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    rel = astro.relation("vt")
    p = rel.vector_index_path("emb")
    assert os.path.isdir(p)
    astro.sql("DROP TABLE vt")
    assert not os.path.isdir(p)


def test_maintenance_is_retry_idempotent(astro, spark):
    """r15 review: the CAS-retried commit closure may re-run
    _maintain_vector_indexes with the same batch — the per-batch marker
    must make the second append a no-op (vector parquet rows don't
    upsert-collapse the way scalar index entries do)."""
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    rng = np.random.RandomState(11)
    batch = spark.createDataFrame(
        _vecs(rng, 5, start=3000), "id long, tag string, emb array<double>"
    )
    batch.createOrReplaceTempView("vt_b2")
    astro.sql("INSERT INTO vt SELECT id, tag, emb FROM vt_b2")
    rel = astro.relation("vt")
    info = rel.meta.vector_indexes["emb"]
    from spark_sql_on_hbase_spark.operators.similarity import ivf_load_index

    _cent, assign = ivf_load_index(spark, rel.vector_index_path("emb"))
    n1 = assign.count()
    # simulate the retry: re-run maintenance with the SAME fragment
    # batch (the newest generation = the INSERT's fragments; regions
    # are rowkey-sorted, so don't index by position)
    mx = max(r.seq for r in rel.meta.regions)
    new_paths = [r.path for r in rel.meta.regions if r.seq == mx]
    rel._append_vector_index("emb", info, new_paths)
    _cent, assign = ivf_load_index(spark, rel.vector_index_path("emb"))
    assert assign.count() == n1  # marker made the re-run a no-op


def test_ivf_append_on_empty_index_raises(spark, tmp_path):
    from spark_sql_on_hbase_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_append,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_empty")
    ivf_build_index(empty, path, n_centroids=4, trained=False)
    batch = spark.createDataFrame(
        [(1, [1.0] * D)], "vec_id long, embedding array<double>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no centroids"):
        ivf_index_append(batch, path)


def test_upserted_id_not_duplicated_in_results(astro, spark):
    """r15 review: an id re-inserted with a new embedding keeps BOTH
    index entries (superset), but results must not rank it twice."""
    astro.sql(
        "CREATE VECTOR INDEX ON vt (emb) USING IVF "
        "OPTIONS(ncentroids=8, trained=false)"
    )
    rel = astro.relation("vt")
    new_emb = [1.0] * D
    spark.createDataFrame(
        [(5, "re", new_emb)], "id long, tag string, emb array<double>"
    ).createOrReplaceTempView("vt_up")
    astro.sql("INSERT INTO vt SELECT id, tag, emb FROM vt_up")
    rel = astro.relation("vt")
    q = spark.createDataFrame(
        [(999, [1.0] * D)], "query_id long, emb array<double>"
    )
    got = rel.vector_topk(q, k=5, nprobe=8).collect()
    ids = [r.neighbor_id for r in got]
    assert len(ids) == len(set(ids)), ids  # no duplicate neighbors
    assert ids[0] == 5  # the live (resolved) vector ranks first
