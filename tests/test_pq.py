"""r14 — product quantization / ADC ANN (Jégou et al., TPAMI 2011).

`pq_codebooks` / `pq_encode` / `ann_pq_topk` are PURE relational/codegen
(no UDF in encode or ADC): per-subspace argmin is an array_min over
literal-centroid struct arrays, ADC scoring is a broadcast lookup-table
join + an INTEGER fixed-point sum (order-independent, hash-stable).
The graded `ann_pq_topk` entry's DuckDB oracle rebuilds the codebook,
codes, LUT and ADC exactly (value-hash verified); these tests pin the
kernel semantics against numpy and the exactness/recall contracts.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.operators.similarity import (
    ann_pq_topk,
    pq_codebooks,
    pq_encode,
)

D, M, KSUB, N = 32, 4, 8, 120
W = D // M


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(D)]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_untrained_codebooks_are_first_k_slices(spark, vecs):
    df, rows = vecs
    cb = pq_codebooks(df, m=M, k_sub=KSUB).collect()
    assert len(cb) == M * KSUB
    by = {(r.sub_id, r.centroid_id): list(r.centroid) for r in cb}
    for s in range(M):
        for cid in range(KSUB):  # first KSUB ids are 0..KSUB-1
            expect = rows[cid][1][s * W : (s + 1) * W]
            assert by[(s, cid)] == pytest.approx(expect, abs=0)


def test_encode_matches_numpy_argmin(spark, vecs):
    df, rows = vecs
    cb = pq_codebooks(df, m=M, k_sub=KSUB)
    codes = {
        (r.vec_id, r.sub_id): r.code
        for r in pq_encode(df, cb).collect()
    }
    assert len(codes) == N * M
    cents = np.array([rows[c][1] for c in range(KSUB)])
    for i, v in rows:
        va = np.array(v)
        for s in range(M):
            d2 = ((cents[:, s * W : (s + 1) * W] - va[s * W : (s + 1) * W]) ** 2).sum(1)
            best = min(range(KSUB), key=lambda c: (d2[c], c))
            assert codes[(i, s)] == best, (i, s)


def test_adc_fixed_point_matches_numpy(spark, vecs):
    df, rows = vecs
    out = ann_pq_topk(
        df,
        df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=4, m=M, k_sub=KSUB,
    ).collect()
    assert {r.query_id for r in out} == {0, 1, 2}
    # reproduce one query's ADC ranking in numpy with the same
    # fixed-point contract: floor(d2_sub * 1e4) summed as ints
    cents = np.array([rows[c][1] for c in range(KSUB)])
    q = np.array(rows[0][1])
    lut = np.zeros((M, KSUB), dtype=np.int64)
    for s in range(M):
        d2 = ((cents[:, s * W : (s + 1) * W] - q[s * W : (s + 1) * W]) ** 2).sum(1)
        lut[s] = np.floor(d2 * 10000).astype(np.int64)
    codes = {}
    for i, v in rows:
        va = np.array(v)
        codes[i] = [
            int(min(range(KSUB), key=lambda c: (
                (((cents[c, s * W:(s + 1) * W] - va[s * W:(s + 1) * W]) ** 2).sum()), c)))
            for s in range(M)
        ]
    adc = {
        i: int(sum(lut[s, codes[i][s]] for s in range(M)))
        for i, _ in rows if i != 0
    }
    expect = sorted(adc, key=lambda i: (adc[i], i))[:4]
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank) if r.query_id == 0]
    assert got == expect
    for r in out:
        if r.query_id == 0:
            assert r.adc_fp == adc[r.neighbor_id]


def test_rerank_orders_by_exact_cosine(spark, vecs):
    df, _ = vecs
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_pq_topk(df, q, k=3, m=M, k_sub=KSUB, rerank=20).collect()
    assert len(out) == 3
    assert "cos_sim" in out[0].asDict()
    sims = [r.cos_sim for r in sorted(out, key=lambda r: r.rank)]
    assert sims == sorted(sims, reverse=True)


def test_trained_pq_with_rerank_finds_planted_twin(spark):
    """Recall contract on planted truth: twin of i is i+1000 at tiny
    noise — trained codebooks + ADC shortlist + exact rerank must
    surface the twin as the top-1 neighbor for every query."""
    rng = np.random.RandomState(11)
    base = rng.randn(60, D)
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    rows += [
        (1000 + i, [float(x) for x in base[i] + rng.randn(D) * 0.01])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_pq_topk(df, q, k=1, m=M, k_sub=8, trained=True, rerank=20).collect()
    hits = sum(1 for r in out if r.neighbor_id == r.query_id + 1000)
    assert hits >= 9, [(r.query_id, r.neighbor_id) for r in out]


def test_dim_not_divisible_raises(spark, vecs):
    df, _ = vecs
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(df, m=5, k_sub=4)


def test_ivfpq_restricts_to_probed_lists_and_matches_pq_on_them(spark, vecs):
    """IVF-PQ's result ⊆ the probed lists' candidates, and its ADC
    values agree with plain PQ for the neighbors both return."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivfpq_topk,
    )

    df, _ = vecs
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(df, q, k=5, n_centroids=8, nprobe=3, m=M, k_sub=KSUB).collect()
    assert len(out) == 15
    # every returned neighbor must live in one of its query's probed lists
    cent = ivf_centroids(df, 8)
    assign = {r.vec_id: r.cluster_id for r in ivf_assign(df, cent).collect()}
    pq_full = {
        (r.query_id, r.neighbor_id): r.adc_fp
        for r in ann_pq_topk(df, q, k=len(assign), m=M, k_sub=KSUB).collect()
    }
    for r in out:
        assert (r.query_id, r.neighbor_id) in pq_full
        assert r.adc_fp == pq_full[(r.query_id, r.neighbor_id)]


def test_ivfpq_trained_rerank_finds_planted_twin(spark):
    from spark_sql_on_hbase_spark.operators.similarity import ivfpq_topk

    rng = np.random.RandomState(17)
    base = rng.randn(60, D)
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    rows += [
        (1000 + i, [float(x) for x in base[i] + rng.randn(D) * 0.01])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(
        df, q, k=1, n_centroids=8, nprobe=3, m=M, k_sub=8,
        trained=True, rerank=20,
    ).collect()
    hits = sum(1 for r in out if r.neighbor_id == r.query_id + 1000)
    assert hits >= 8, [(r.query_id, r.neighbor_id) for r in out]


def test_empty_corpus_returns_empty_with_schema(spark):
    from spark_sql_on_hbase_spark.operators.similarity import ivfpq_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [0.0] * D)], "query_id long, embedding array<double>"
    )
    out = ann_pq_topk(empty, q, k=3, m=M, k_sub=KSUB)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_fp", "rank"]
    out2 = ivfpq_topk(empty, q, k=3, m=M, k_sub=KSUB, rerank=5)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_persisted_pq_index_roundtrip_and_identical_results(spark, vecs, tmp_path):
    """pq_build_index pays the encode once; ann_pq_topk_indexed over the
    persisted codes must return EXACTLY what the inline path returns
    (untrained codebooks → both deterministic)."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        ann_pq_topk_indexed,
        pq_build_index,
        pq_load_index,
    )

    df, _ = vecs
    path = str(tmp_path / "pq_idx")
    pq_build_index(df, path, m=M, k_sub=KSUB, trained=False)
    cb, codes = pq_load_index(spark, path)
    assert cb.count() == M * KSUB
    assert codes.count() == N * M
    # persisted codes ≡ inline encode
    inline = {
        (r.vec_id, r.sub_id): r.code
        for r in pq_encode(df, pq_codebooks(df, m=M, k_sub=KSUB)).collect()
    }
    for r in codes.collect():
        assert inline[(r.vec_id, r.sub_id)] == r.code
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(tuple, ann_pq_topk_indexed(spark, path, q, k=4).collect())
    )
    want = sorted(map(tuple, ann_pq_topk(df, q, k=4, m=M, k_sub=KSUB).collect()))
    assert got == want
    # rerank path needs the corpus and returns exact-cosine order
    out = ann_pq_topk_indexed(spark, path, q, k=2, rerank=10, corpus=df).collect()
    assert len(out) == 6 and "cos_sim" in out[0].asDict()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rerank needs"):
        ann_pq_topk_indexed(spark, path, q, k=2, rerank=10)


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_pq_index_append_equals_rebuild_and_drift_guard(spark, tmp_path):
    """Append-then-query ≡ rebuild-then-query under the same codebooks;
    an out-of-distribution batch trips the retrain recommendation."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        ann_pq_topk_indexed,
        pq_build_index,
        pq_index_append,
    )

    rng = np.random.RandomState(5)
    base_rows = [(i, [float(x) for x in rng.randn(D)]) for i in range(80)]
    new_rows = [(500 + i, [float(x) for x in rng.randn(D)]) for i in range(20)]
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<double>")
    newb = spark.createDataFrame(new_rows, "vec_id long, embedding array<double>")
    full = base.unionAll(newb)

    inc = str(tmp_path / "pq_inc")
    pq_build_index(base, inc, m=M, k_sub=KSUB, trained=False)
    r = pq_index_append(newb, inc)
    assert r["appended"] == 20
    assert r["baseline_qerr"] is not None and r["batch_qerr"] is not None
    assert r["retrain_recommended"] is False  # same distribution

    # rebuild reference: full corpus, SAME (untrained, deterministic)
    # codebooks — base holds the lowest ids, so first-k slices agree
    ref = str(tmp_path / "pq_ref")
    pq_build_index(full, ref, m=M, k_sub=KSUB, trained=False)
    q = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(map(tuple, ann_pq_topk_indexed(spark, inc, q, k=5).collect()))
    want = sorted(map(tuple, ann_pq_topk_indexed(spark, ref, q, k=5).collect()))
    assert got == want

    # drift: a far-shifted batch must recommend retraining
    shifted = spark.createDataFrame(
        [(900 + i, [float(x + 40.0) for x in rng.randn(D)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    r2 = pq_index_append(shifted, inc)
    assert r2["retrain_recommended"] is True
    assert r2["batch_qerr"] > r2["baseline_qerr"]


def test_empty_corpus_build_and_append_guards(spark, tmp_path):
    """r15 (ADVICE r14 low): pq_build_index on an EMPTY corpus must
    write a well-formed empty index (not crash in pq_encode's explode),
    and pq_index_append against such an index must raise a clear error
    instead of TypeError on ``None + 1``."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        ann_pq_topk_indexed,
        pq_build_index,
        pq_index_append,
        pq_load_index,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    path = str(tmp_path / "pq_empty")
    pq_build_index(empty, path, m=M, k_sub=KSUB, trained=False)
    cb, codes = pq_load_index(spark, path)
    assert cb.count() == 0 and codes.count() == 0
    q = spark.createDataFrame(
        [(0, [0.0] * D)], "query_id long, embedding array<double>"
    )
    out = ann_pq_topk_indexed(spark, path, q, k=3)
    assert out.count() == 0  # empty-corpus parity guard shape
    batch = spark.createDataFrame(
        [(1, [1.0] * D)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty codebook"):
        pq_index_append(batch, path)


def test_pq_encode_empty_codebook_returns_typed_empty(spark, vecs):
    df, _rows = vecs
    cb = spark.createDataFrame(
        [], "sub_id int, centroid_id long, centroid array<double>"
    )
    out = pq_encode(df, cb, with_err=True)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "sub_id", "code", "qerr",
    ]


def test_pq_encode_expr_parity(spark):
    """r15: pq_encode builds its candidate expressions as SQL strings
    (one F.expr per subspace) instead of ~2,000 py4j Column calls —
    this pins the two forms bit-identical (codes AND the qerr doubles,
    compared by IEEE bit pattern) on a codebook of extreme doubles:
    subnormals, -0.0, overflow-to-inf squares, repr-exponent forms."""
    import struct as _struct

    d, m, w, k_sub = 8, 2, 4, 3
    stress = [
        [5e-324, -0.0, 1e300, 0.1 + 0.2, -1.5e-5, 3.141592653589793, -42.0, 1e-308],
        [2.0, -2.0, 1e-8, 123456789.123456789, 0.0, -5e-324, 7.5, -0.25],
        [1e300, 1e300, -1e300, 0.5, 1.7976931348623157e308, -0.1, 0.3, 2.225073858507e-311],
    ]
    vec_rows = [(i, [float(x) for x in row]) for i, row in enumerate(stress)]
    vecs_df = spark.createDataFrame(vec_rows, "vec_id long, embedding array<double>")
    cb_rows = [
        (s, cid, stress[cid][s * w : (s + 1) * w])
        for s in range(m)
        for cid in range(k_sub)
    ]
    cb = spark.createDataFrame(
        cb_rows, "sub_id int, centroid_id long, centroid array<double>"
    )

    # inline reference: the pre-r15 Column-API construction, verbatim
    def _d2(sub_col, cent_vals):
        lit_arr = F.array(*[F.lit(x) for x in cent_vals])
        return F.aggregate(
            F.zip_with(
                sub_col,
                lit_arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    by_sub = {}
    for s, cid, cv in cb_rows:
        by_sub.setdefault(s, []).append((cid, [float(x) for x in cv]))
    structs = []
    for s in sorted(by_sub):
        sub_col = F.slice(F.col("embedding"), s * w + 1, w)
        cands = [
            F.struct(_d2(sub_col, cv).alias("d2"), F.lit(cid).cast("long").alias("cid"))
            for cid, cv in sorted(by_sub[s])
        ]
        best = F.array_min(F.array(*cands))
        structs.append(
            F.struct(
                F.lit(s).alias("sub_id"),
                best.getField("cid").alias("code"),
                best.getField("d2").alias("qerr"),
            )
        )
    ref = (
        vecs_df.select(F.col("vec_id"), F.explode(F.array(*structs)).alias("sc"))
        .select(
            "vec_id",
            F.col("sc.sub_id").alias("sub_id"),
            F.col("sc.code").alias("code"),
            F.col("sc.qerr").alias("qerr"),
        )
    )
    new = pq_encode(vecs_df, cb, with_err=True)
    assert new.schema == ref.schema

    def key(r):
        return (r.vec_id, r.sub_id)

    got = sorted(new.collect(), key=key)
    want = sorted(ref.collect(), key=key)
    assert len(got) == len(want) == len(stress) * m
    for g, r in zip(got, want):
        assert (g.vec_id, g.sub_id, g.code) == (r.vec_id, r.sub_id, r.code)
        assert _struct.pack("<d", g.qerr) == _struct.pack("<d", r.qerr), (g, r)


def test_pq_encode_quotes_nonidentifier_vec_col(spark):
    """r15 review: the SQL-string rewrite must keep the Column API's
    column-name contract — reserved words ("order") and names with
    spaces encode identically to a plain-named copy of the same data
    (the generated text backtick-quotes the identifier)."""
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(6)]
    cb_rows = [
        (s, cid, [float(cid + s), float(cid)])
        for s in range(2)
        for cid in range(2)
    ]
    cb = spark.createDataFrame(
        cb_rows, "sub_id int, centroid_id long, centroid array<double>"
    )
    plain = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = sorted(
        pq_encode(plain, cb, with_err=True).collect(),
        key=lambda r: (r.vec_id, r.sub_id),
    )
    for name in ("order", "my vec"):
        odd = spark.createDataFrame(rows, ["vec_id", name])
        got = sorted(
            pq_encode(odd, cb, vec_col=name, with_err=True).collect(),
            key=lambda r: (r.vec_id, r.sub_id),
        )
        assert [(g.vec_id, g.sub_id, g.code, g.qerr) for g in got] == [
            (w.vec_id, w.sub_id, w.code, w.qerr) for w in want
        ], name
