"""Operator unit tests: dedup, similarity, text analysis, multimodal.

Small inline fixtures with hand-checkable expectations; the sf-scale
value checks live in the DuckDB-oracle battery (queries_pipeline.py).
"""

import pytest
from pyspark.sql import functions as F

from spark_sql_on_hbase_spark.operators import dedup as D
from spark_sql_on_hbase_spark.operators import multimodal as M
from spark_sql_on_hbase_spark.operators import similarity as S
from spark_sql_on_hbase_spark.operators import text_analysis as TA


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (4, "completely different words entirely here now friends"),
        (5, "le chat et le chien et la souris"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r.keep_id: r.n_dups for r in D.exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 merged, canonical id 1
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_near_dup_found(docs):
    pairs = {(r.id_a, r.id_b) for r in D.minhash_lsh_candidates(docs, num_perm=16, bands=8).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_ngram_jaccard_exact_and_near(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_simhash_similar_docs_close(docs):
    sigs = {r.doc_id: r.simhash for r in D.simhash_signatures(docs, bits=16).collect()}
    assert sigs[1] == sigs[2]  # identical text → identical simhash
    ham_near = bin(sigs[1] ^ sigs[3]).count("1")
    ham_far = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham_near <= ham_far
    assert all(0 <= s < 2**16 for s in sigs.values())


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.8, 0.2, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_knn_bruteforce(vecs):
    q = vecs.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.knn_bruteforce(vecs, q, k=2).collect()
    ranked = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert ranked[0][0] == 1  # nearest by cosine
    assert len(ranked) == 2


def test_lsh_signature_properties(vecs):
    sigs = {r.vec_id: r.sig for r in S.lsh_signatures(vecs, bits=16).collect()}
    assert sigs[0] == sigs[1] or bin(sigs[0] ^ sigs[1]).count("1") <= bin(sigs[0] ^ sigs[3]).count("1")
    # opposite vectors get complementary signatures
    assert sigs[0] ^ sigs[3] == 2**16 - 1


def test_cosine_batch_bit_identical_to_hof(spark):
    # the vectorized rerank kernel must produce bit-identical doubles to
    # the HOF fold (which the DuckDB oracles mirror) — exact ==, no eps
    from spark_sql_on_hbase_spark.functions.vector import (
        cosine_similarity,
        cosine_similarity_batch,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = emb.filter(F.col("vec_id") < 40).select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.filter(F.col("vec_id") < 40).select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b)
    rows = pairs.select(
        "ia", "ib",
        cosine_similarity("va", "vb").alias("hof"),
        cosine_similarity_batch("va", "vb").alias("vec"),
    ).collect()
    assert len(rows) == 1600
    for r in rows:
        assert r.hof == r.vec, (r.ia, r.ib, r.hof, r.vec)
    # edge contracts match too: zero-norm → NULL on both (HOF via
    # try_divide — plain `/` throws under ANSI), NaN data → NaN on both
    import math

    edge = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, float("nan")]), (2, [1.0, 2.0])],
        "id long, v array<float>",
    )
    er = (
        edge.alias("x")
        .crossJoin(edge.alias("y"))
        .select(
            F.col("x.id").alias("ix"), F.col("y.id").alias("iy"),
            cosine_similarity(F.col("x.v"), F.col("y.v")).alias("hof"),
            cosine_similarity_batch(F.col("x.v"), F.col("y.v")).alias("vec"),
        )
        .collect()
    )
    for r in er:
        if 1 in (r.ix, r.iy):
            # NaN contaminates the denominator (0·NaN = NaN ≠ 0), so NaN
            # wins over the zero-norm NULL rule on both kernels
            assert math.isnan(r.hof) and math.isnan(r.vec), r
        elif 0 in (r.ix, r.iy):
            assert r.hof is None and r.vec is None, r
        else:
            assert r.hof == r.vec is not None, r


def test_lsh_signatures_vectorized_matches_hof(spark, vecs):
    # the numpy pandas_udf kernel must be bit-identical to the Catalyst
    # HOF formulation (which the DuckDB oracle mirrors) — including on
    # real 64-dim float32 embeddings, not just the toy fixture
    for df in (vecs, spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")):
        fast = {r.vec_id: r.sig for r in S.lsh_signatures(df, bits=16).collect()}
        ref = {r.vec_id: r.sig for r in S.lsh_signatures_hof(df, bits=16).collect()}
        assert fast == ref


def test_neardup_pairs(vecs):
    pairs = {(r.id_a, r.id_b) for r in S.neardup_pairs(vecs, threshold=0.95).collect()}
    assert (0, 1) in pairs and (1, 4) in pairs
    assert (0, 3) not in pairs


def test_neardup_pairs_lsh(vecs):
    df = S.neardup_pairs_lsh(vecs, threshold=0.95, bits=16, bands=4)
    # the scale path must never materialize corpus×corpus
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    pairs = {(r.id_a, r.id_b) for r in df.collect()}
    exact = {(r.id_a, r.id_b) for r in S.neardup_pairs(vecs, threshold=0.95).collect()}
    # LSH output ⊆ exact (rerank is exact); near-identical vectors share
    # all bands, so the obvious dup pair must be recalled
    assert pairs <= exact
    assert (0, 1) in pairs


def test_language_id(docs):
    out = {r.doc_id: r.lang_pred for r in TA.language_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "fr"


def test_quality_and_tokens(docs):
    q = {r.doc_id: r for r in TA.quality_score(docs).collect()}
    assert q[1].n_tokens == 9
    assert 0.0 <= q[1].quality <= 1.0
    t = {r.doc_id: r for r in TA.token_count(docs).collect()}
    assert t[1].n_ws_tokens == 9
    assert t[1].n_word_tokens == 9


def test_fingerprint_matches_for_identical_docs(docs):
    fp = {r.doc_id: r for r in TA.fingerprint(docs).collect()}
    assert fp[1].min_shingle_hash == fp[2].min_shingle_hash
    assert fp[1].text_hash == fp[2].text_hash
    assert fp[1].n_shingles == 7  # 9 tokens → 7 word-3grams


# ---- multimodal plumbing ---------------------------------------------------
def test_attach_binary_and_decode(spark, docs):
    bdf = M.attach_binary_column(docs, "text", "blob")
    assert dict(bdf.dtypes)["blob"] == "binary"
    meta = M.decode_media(bdf, "blob")
    rows = {r.doc_id: r.meta for r in meta.collect()}
    assert rows[1]["mime"] == "image/fake"
    assert rows[1]["width"] == len("the quick brown fox jumps over the lazy dog") % 640 + 1
    # deterministic: same text → same fake dims
    assert rows[1] == rows[2]


def test_extract_features_shape(spark, docs):
    bdf = M.attach_binary_column(docs, "text", "blob")
    feats = M.extract_features(bdf, "blob", dim=8)
    rows = feats.collect()
    assert all(len(r.features) == 8 for r in rows)
    by_id = {r.doc_id: r.features for r in rows}
    assert by_id[1] == by_id[2]  # deterministic


def test_frame_sample_explodes(spark):
    df = spark.createDataFrame([(1, b"x" * 2500)], ["vid_id", "blob"])
    out = M.frame_sample(df, "blob", every_n_bytes=1000)
    rows = sorted((r.frame_idx, r.frame_off) for r in out.collect())
    assert rows == [(0, 0), (1, 1000)]


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF with nprobe=all centroids must equal brute force exactly; with
    fewer probes it returns a subset-quality approximation."""
    from pyspark.sql import functions as F

    from spark_sql_on_hbase_spark.operators.similarity import ivf_topk, knn_bruteforce
    from spark_sql_on_hbase_spark.tables import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb, queries, k=5).collect()}
    full_probe = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8).collect()
    }
    assert full_probe == exact  # probing every list == brute force
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=2).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2  # nonempty, sane approximation on tiny data


def test_knn_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multi-probe must find at least every single-bucket
    candidate (strict superset of buckets probed) and lift recall vs
    brute-force truth on real embeddings."""
    from spark_sql_on_hbase_spark.operators.similarity import knn_bruteforce, knn_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 15).select(F.col("vec_id").alias("query_id"), "embedding")
    truth = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb, q, k=5).collect()}
    single = {(r.query_id, r.neighbor_id) for r in knn_lsh(emb, q, k=5, bits=8).collect()}
    multi = {(r.query_id, r.neighbor_id) for r in knn_lsh(emb, q, k=5, bits=8, multiprobe=True).collect()}
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_single, (r_single, r_multi)


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_ivf_trained_kmeans_recovers_from_degenerate_seeding(spark):
    """The trained (spherical-KMeans) quantizer's value: the lowest-id
    stub collapses when the first n_centroids vectors happen to share one
    cluster — its cells then slice that cluster only, and every other
    cluster's neighbors scatter.  Training is seed-robust: recall must
    improve on this adversarial layout and full-probe must stay exact."""
    import numpy as np

    from spark_sql_on_hbase_spark.operators.similarity import ivf_topk, knn_bruteforce

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(4, 16)) * 3
    rows = []
    for ci in range(4):  # ids 0..49 are ALL cluster 0 — degenerate for the stub
        for j in range(50):
            v = centers[ci] + rng.normal(size=16) * 0.3
            rows.append((ci * 50 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id").isin(10, 60, 110, 160)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb, queries, k=5).collect()}

    def recall(trained):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                emb, queries, k=5, n_centroids=8, nprobe=2, trained=trained
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_stub, r_trained = recall(False), recall(True)
    assert r_trained >= r_stub, (r_stub, r_trained)
    assert r_trained >= 0.9, r_trained
    # correctness invariance: probing every trained list == brute force
    full = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8, trained=True).collect()
    }
    assert full == exact


def test_topk_terms_plan_and_values(docs):
    from spark_sql_on_hbase_spark.operators import sketch as SK

    df = SK.topk_terms(docs, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bounded per-partition top-k, never a global sort
    assert "TakeOrderedAndProject" in plan, plan
    got = [(r.term, r.cnt) for r in df.collect()]
    exact = SK.term_counts(docs).collect()
    want = sorted(((r.term, r.cnt) for r in exact), key=lambda t: (-t[1], t[0]))[:5]
    assert got == want


def test_heavy_hitters_mg_capture_guarantee(spark):
    from spark_sql_on_hbase_spark.operators import sketch as SK

    # skewed stream: term 'hot' ≫ N/capacity, many cold singletons
    rows = [("hot",)] * 400 + [(f"cold{i}",) for i in range(2000)] + [("warm",)] * 120
    terms = spark.createDataFrame(rows, ["term"]).repartition(4)
    mg = {r.term: r.est_cnt for r in SK.heavy_hitters_mg(terms, capacity=16).collect()}
    n = len(rows)
    # every term with true count > N/capacity is captured...
    assert "hot" in mg and "warm" in mg
    # ...and estimates are lower bounds within N/capacity of the truth
    assert mg["hot"] <= 400 and 400 - mg["hot"] <= n / 16
    assert mg["warm"] <= 120 and 120 - mg["warm"] <= n / 16


def test_tfidf_top_terms(docs):
    out = TA.tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc gets ≤ k ranked terms, ranks contiguous from 1
    for rows in by_doc.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r.score_fp >= 0 or r.tf > 0 for r in rows)
    # 'the' appears in docs 1-3 (df=3 of 5) → low idf; doc 4's unique terms
    # (df=1) must outrank any shared term for doc 4
    top4 = next(r for r in by_doc[4] if r.rank == 1)
    assert top4.term in ("completely", "different", "words", "entirely", "here", "now", "friends")
    # doc 5: 'le' tf=2 and 'et' tf=2, both df=1 → tie broken by term asc
    top5 = [r.term for r in sorted(by_doc[5], key=lambda r: r.rank)]
    assert top5[0] == "et" and top5[1] == "le"


def test_duplicate_clusters(spark, docs):
    out = {r.doc_id: r.cluster_id for r in D.duplicate_clusters(docs).collect()}
    # 1-2 identical, 3 near-dup of both → one transitive cluster rooted at 1
    assert out[1] == 1 and out[2] == 1
    assert out[3] in (1, 3)  # joins the cluster iff LSH banding links it
    # singletons keep their own id
    assert out[4] == 4 and out[5] == 5
    # explicit transitive chain via injected pairs: 10-20, 20-30 → all → 10
    ids = spark.createDataFrame([(10,), (20,), (30,), (40,)], ["doc_id"])
    pairs = spark.createDataFrame([(10, 20), (20, 30)], ["id_a", "id_b"])
    out2 = {r.doc_id: r.cluster_id for r in D.duplicate_clusters(ids, pairs=pairs).collect()}
    assert out2 == {10: 10, 20: 10, 30: 10, 40: 40}


def test_llm_corpus_pipeline_end_to_end(spark):
    """The operators compose into the canonical training-data pipeline:
    language filter → quality gate → near-dup clustering → keep one doc
    per cluster → token budget of the surviving corpus.  One flow, no
    collect() between stages — the shape a 100 TB run would take."""
    import spark_sql_on_hbase_spark.operators.text_analysis as TA
    from spark_sql_on_hbase_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    n_docs = docs.count()

    lang = TA.language_id(docs)
    quality = TA.quality_score(docs)
    gated = (
        docs.join(lang.filter(F.col("lang_pred") == "en").select("doc_id"), "doc_id")
        .join(quality.filter(F.col("quality") >= 0.2).select("doc_id"), "doc_id")
    )
    clusters = D.duplicate_clusters(gated, num_perm=16, bands=8)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    surviving = gated.join(keep, "doc_id")
    tokens = TA.token_count(surviving).agg(F.sum("n_ws_tokens").alias("total")).collect()[0].total

    n_gated, n_keep = gated.count(), surviving.count()
    assert 0 < n_keep <= n_gated <= n_docs
    assert n_keep < n_gated  # the corpus has known near-dups to drop
    assert tokens > 0


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_duplicate_clusters_shortcut_beats_diameter(spark):
    """A 60-node path has diameter 59: plain min-label propagation cannot
    converge in 10 rounds (and must RAISE, not return partial labels);
    pointer-jumping converges in O(log n) rounds and labels the whole
    path with its minimum."""
    n = 60
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    got = {
        r.doc_id: r.cluster_id
        for r in D.duplicate_clusters(docs, pairs=pairs, max_iter=10, shortcut=True).collect()
    }
    assert got == {i: 0 for i in range(n)}
    with pytest.raises(RuntimeError, match="did not converge"):
        D.duplicate_clusters(docs, pairs=pairs, max_iter=10, shortcut=False).collect()


def test_resize_image_contract(spark, docs):
    bdf = M.attach_binary_column(docs, "text", "blob")
    out = {r.doc_id: r for r in M.resize_image(bdf, 2, 2).collect()}
    r1 = out[1]
    n = len("the quick brown fox jumps over the lazy dog")
    w, h = n % 640 + 1, n % 480 + 1
    import math
    assert r1.new_w == 2 and r1.new_h == 2
    assert r1.new_len == math.ceil(n * min(1.0, 4 / (w * h)))
    assert len(r1.resized) == r1.new_len
    # resized bytes are a prefix of the original blob
    assert bytes(r1.resized) == b"the quick brown fox jumps over the lazy dog"[: r1.new_len]
    # target larger than source → no upscale, blob unchanged
    big = {r.doc_id: r for r in M.resize_image(bdf, 10000, 10000).collect()}
    assert big[1].new_len == n and bytes(big[1].resized)[:5] == b"the q"


def test_hll_sketch_persist_and_merge(spark, tmp_path):
    """The 100 TB pre-aggregation workflow: per-group HLL sketches are
    PERSISTED as a binary column (one tiny parquet per 'day'), re-read
    later, and hll_union_agg'd — the merged estimate must land within 5%
    of the exact distinct over the raw data, with no re-scan of it."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # build per-(lang) sketches in two separate "ingest batches" and
    # persist each — the merge must work across independently-written files
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    for i, half in enumerate((half1, half2)):
        (half.groupBy("lang").agg(F.hll_sketch_agg("source").alias("sk"))
         .write.mode("overwrite").parquet(str(tmp_path / f"day{i}")))
    merged = (
        spark.read.parquet(str(tmp_path / "day0"), str(tmp_path / "day1"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0].est
    )
    exact = docs.select("source").distinct().count()
    assert abs(merged - exact) <= max(1, 0.05 * exact), (merged, exact)


def test_ivf_index_persist_and_query(spark, tmp_path):
    """Index workflow: build once (train + assign, persisted with the
    assignment partitioned by cluster_id — the inverted-index property in
    the file layout), reload, query — results identical to the inline
    train-per-call path."""
    from spark_sql_on_hbase_spark.operators.similarity import (
        ivf_build_index,
        ivf_load_index,
        ivf_topk,
    )
    from pyspark.sql import functions as F
    import os

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx_path = str(tmp_path / "ivf_idx")
    ivf_build_index(emb, idx_path, n_centroids=8, trained=True)
    # inverted-list layout on disk: one directory per cluster
    parts = [d for d in os.listdir(f"{idx_path}/assign") if d.startswith("cluster_id=")]
    assert len(parts) > 1
    idx = ivf_load_index(spark, idx_path)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, queries, k=5, nprobe=4, index=idx).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=8, nprobe=4, trained=True
        ).collect()
    }
    assert got == want
    # partition pruning on the probed lists: the assignment scan must
    # touch only the probed clusters' directories, not all of them
    from spark_sql_on_hbase_spark.plans.metrics import scan_partition_files

    pruned_df = ivf_topk(emb, queries, k=5, nprobe=4, index=ivf_load_index(spark, idx_path))
    pruned_df.write.mode("overwrite").format("noop").save()
    nparts, nfiles = scan_partition_files(pruned_df, "ivf_idx/assign")
    # 3 queries × nprobe=4 probe ≤ 12 distinct lists but ≥ 4; strictly
    # fewer than the 8 on disk proves directory-level pruning
    assert 0 < nparts < len(parts), (nparts, len(parts))
    assert nfiles < len(parts) * 1 + 64  # sanity: bounded by pruned dirs
    # and the unpruned path reads every list directory
    full_df = ivf_topk(
        emb, queries, k=5, nprobe=4,
        index=ivf_load_index(spark, idx_path), prune_partitions=False,
    )
    full_df.write.mode("overwrite").format("noop").save()
    nparts_full, _ = scan_partition_files(full_df, "ivf_idx/assign")
    assert nparts_full == len(parts), (nparts_full, len(parts))


def test_incremental_dedup_verdicts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # corpus exact
            # near dup of corpus doc 1: jaccard 0.875, band-collides at
            # 16 perm / 4 bands (verified against the fixed hash params)
            (11, "the quick brown fox jumps over the lazy dog again"),
            (12, "entirely novel words that match nothing else here"),
            (13, "entirely novel words that match nothing else here"),  # batch dup of 12
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.verdict for r in D.incremental_dedup(corpus, batch).collect()}
    assert out == {
        10: "dup_corpus_exact",
        11: "dup_corpus_near",
        12: "novel",
        13: "dup_batch",
    }


def test_incremental_dedup_via_persisted_index(spark, tmp_path):
    """Probing a persisted LSH index must classify identically to the
    inline corpus pass — the corpus is never re-shingled."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "entirely novel words that match nothing else here"),
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "lsh_index")
    D.minhash_index_build(corpus, path)
    idx = D.minhash_index_load(spark, path)
    got = {r.doc_id: r.verdict for r in
           D.incremental_dedup(None, batch, corpus_index=idx).collect()}
    want = {r.doc_id: r.verdict for r in
            D.incremental_dedup(corpus, batch).collect()}
    assert got == want == {10: "dup_corpus_exact", 11: "novel"}
    # index layout: band signatures are partitioned by band directory
    import os

    assert any(d.startswith("band=") for d in os.listdir(f"{path}/bands"))


def test_mixture_sample_solves_rates(spark):
    """Domain rates derive from corpus counts: abundant domains get
    downsampled toward the target share, scarce ones are clamped at 1."""
    from spark_sql_on_hbase_spark.operators.sampling import mixture_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "dom"])
    out = mixture_sample(
        df, "doc_id", "dom", {"big": 500_000, "small": 500_000}, total=200
    )
    by_dom = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # small: rate clamps to 1.0 → all 100 kept; big: rate 100/900 ≈ 0.111
    assert by_dom["small"] == 100
    assert 60 <= by_dom["big"] <= 140  # hash-Bernoulli around 100
    # deterministic: re-running yields the identical kept set
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in out.collect())
    assert ids1 == ids2


def test_contamination_flags(spark):
    """Docs sharing a 4-gram with the benchmark are flagged; others and
    gram-less (short) docs are not."""
    from spark_sql_on_hbase_spark.operators.decontam import (
        contamination_flags,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated set of training words here"),
            (3, "too short"),  # < 4 tokens → zero grams, never flagged
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "we ask about the quick brown fox in this eval question")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in contamination_flags(corpus, bench, n=4).collect()}
    assert out[1].contaminated and out[1].n_hits >= 1
    assert not out[2].contaminated and out[2].n_hits == 0
    assert out[3].n_grams == 0 and not out[3].contaminated and out[3].hit_ratio == 0.0
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench, n=4).collect())
    assert kept == [2, 3]


def test_repetition_signals(spark):
    from spark_sql_on_hbase_spark.operators.text_analysis import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),  # one token repeated
            (2, "all words here are fully distinct tokens friend"),
            (3, "one"),  # single token: no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].repetitive and out[1].max_token_frac == 1.0
    assert out[1].dup_2gram_frac == 1.0  # "spam spam" x7 occurrences all dup
    assert not out[2].repetitive and out[2].unique_token_ratio == 1.0
    assert out[2].dup_2gram_frac == 0.0
    # degenerate single-token doc: max_token_frac is trivially 1.0 and
    # crosses the threshold — length gating is quality_score's job
    assert out[3].n_tokens == 1 and out[3].dup_2gram_frac == 0.0
    assert out[3].max_token_frac == 1.0 and out[3].repetitive


def test_semantic_dedup(spark):
    """Near-identical vectors in the same cluster dedup to the min-id
    representative; cross-cluster similarity is never even examined."""
    from spark_sql_on_hbase_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid seed A
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid seed B
        (2, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 0 (cluster A)
        (3, [0.0, 0.98, 0.02, 0.0]),  # near-dup of 1 (cluster B)
        (4, [0.6, 0.8, 0.0, 0.0]),    # cluster B-ish but not a dup at 0.99
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(df, n_clusters=2, threshold=0.99).collect()}
    assert len(out) == 5  # every input vector gets a verdict row
    assert out[0].kept and out[0].dup_of is None
    assert not out[2].kept and out[2].dup_of == 0
    assert not out[3].kept and out[3].dup_of == 1
    assert out[4].kept  # similar-ish but below threshold
    assert out[2].cluster_id == out[0].cluster_id
    assert out[3].cluster_id == out[1].cluster_id


def test_incremental_dedup_rejects_mismatched_index_params(spark, tmp_path):
    from spark_sql_on_hbase_spark.operators.dedup import (
        incremental_dedup,
        minhash_index_build,
        minhash_index_load,
    )

    corpus = spark.createDataFrame(
        [(1, "an established corpus document with enough words here")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "idx32")
    minhash_index_build(corpus, path, num_perm=8, bands=2)
    idx = minhash_index_load(spark, path)
    batch = spark.createDataFrame([(10, "some arriving text")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="built with"):
        incremental_dedup(None, batch, corpus_index=idx)  # defaults 16/4
    # matching parameters pass
    assert incremental_dedup(None, batch, num_perm=8, bands=2, corpus_index=idx).count() == 1


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    """Incremental index maintenance (VERDICT r5 item 4): appending a
    batch's signatures must yield the SAME probe verdicts as rebuilding
    the index over corpus+batch — and the append job shingles only the
    batch (the corpus text is never touched again)."""
    from spark_sql_on_hbase_spark.operators.dedup import (
        incremental_dedup,
        minhash_index_append,
        minhash_index_build,
        minhash_index_load,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
        ],
        ["doc_id", "text"],
    )
    admitted = spark.createDataFrame(
        [(3, "entirely novel words that match nothing else here")],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "entirely novel words that match nothing else here"),
            (12, "completely fresh unrelated content nothing matches this"),
        ],
        ["doc_id", "text"],
    )
    inc_path = str(tmp_path / "idx_inc")
    minhash_index_build(corpus, inc_path)
    minhash_index_append(admitted, inc_path)
    full_path = str(tmp_path / "idx_full")
    minhash_index_build(corpus.unionByName(admitted), full_path)
    got_inc = {r.doc_id: r.verdict for r in incremental_dedup(
        None, probe, corpus_index=minhash_index_load(spark, inc_path)).collect()}
    got_full = {r.doc_id: r.verdict for r in incremental_dedup(
        None, probe, corpus_index=minhash_index_load(spark, full_path)).collect()}
    assert got_inc == got_full == {
        10: "dup_corpus_exact", 11: "dup_corpus_exact", 12: "novel",
    }
    # appending under mismatched parameters is rejected before any write
    with pytest.raises(ValueError, match="built with"):
        minhash_index_append(admitted, inc_path, num_perm=8, bands=2)
    # sidecar rides the same FS as the parquet (1-row JSON dataset) and
    # survives load: the params guard stays armed
    idx = minhash_index_load(spark, inc_path)
    assert idx.params == {"num_perm": 16, "bands": 4, "shingle_n": 3}
    # an index without a sidecar appends/loads with a warning, not a crash
    import shutil
    import warnings as _w

    shutil.rmtree(f"{inc_path}/params")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        idx2 = minhash_index_load(spark, inc_path)
        assert idx2.params is None
        assert any("mismatch guard" in str(w.message) for w in rec)


def test_contamination_threshold_exact_at_boundary(spark):
    """The verdict compares exact counts (n_hits > ratio*n_grams), not the
    1e-6-floored report ratio — a ratio exactly AT the threshold is not
    contaminated, one above is."""
    from spark_sql_on_hbase_spark.operators.decontam import contamination_flags

    corpus = spark.createDataFrame(
        [
            # 5 tokens → 2 distinct 4-grams; bench shares exactly 1 → ratio 0.5
            (1, "the quick brown fox jumps"),
            # bench shares both grams → ratio 1.0
            (2, "quick brown fox jumps over"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over nothing")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in
           contamination_flags(corpus, bench, n=4, max_hit_ratio=0.5).collect()}
    assert out[1].n_grams == 2 and out[1].n_hits == 1 and not out[1].contaminated
    assert out[2].contaminated


def test_linear_classifier_score(spark):
    """Broadcast-join inference: weights looked up by hashed feature;
    absent features contribute 0; logit is an exact integer ppm sum."""
    from spark_sql_on_hbase_spark.operators.classifier import (
        hashed_features,
        linear_score,
        make_hash_weights,
    )

    docs = spark.createDataFrame(
        [(1, "good words here"), (2, "good words here"), (3, "bad")],
        ["doc_id", "text"],
    )
    w = make_hash_weights(spark)
    out = {r.doc_id: r for r in linear_score(docs, w, bias_ppm=250_000).collect()}
    assert out[1].logit_ppm == out[2].logit_ppm  # identical text, identical score
    assert out[1].n_features_hit == 5  # 3 unigrams + 2 bigrams
    assert out[3].n_features_hit == 1
    assert 0.0 < out[3].prob < 1.0
    # hand-verify doc 3: single unigram "bad"
    f = {r.feature_id: r.tf for r in hashed_features(docs.filter("doc_id=3")).collect()}
    (fid, tf), = f.items()
    assert out[3].logit_ppm == ((fid % 1001) - 500) * 1000 * tf + 250_000
    # a sparse weight table (missing features) scores as zero contribution
    empty_w = w.filter("feature_id < 0")
    out0 = {r.doc_id: r.logit_ppm for r in linear_score(docs, empty_w).collect()}
    assert out0 == {1: 0, 2: 0, 3: 0}


def test_boilerplate_strip(spark):
    """Segments repeated across >= min_df docs are stripped everywhere,
    order of survivors preserved; rare segments stay."""
    docs = spark.createDataFrame(
        [
            (1, "subscribe now unique alpha content"),
            (2, "subscribe now beta words"),
            (3, "subscribe now gamma stuff"),
            (4, "delta only rare things"),
        ],
        ["doc_id", "text"],
    )
    bp = TA.boilerplate_segments(docs, min_df=3)
    hits = {r.seg_hash: r.df for r in bp.collect()}
    assert len(hits) == 2 and set(hits.values()) == {3}  # "subscribe", "now"
    out = {r.doc_id: r for r in TA.strip_boilerplate(docs, bp).collect()}
    assert out[1].clean_text == "unique alpha content" and out[1].n_removed == 2
    assert out[2].clean_text == "beta words"
    assert out[4].clean_text == "delta only rare things" and out[4].n_removed == 0
    # empty dictionary → no-op
    out0 = {r.doc_id: r.n_removed for r in
            TA.strip_boilerplate(docs, bp.filter("df < 0")).collect()}
    assert set(out0.values()) == {0}
    # scale shape (VERDICT r5 item 1): the dictionary probe must be a
    # compiled BroadcastHashJoin — NOT the interpreted array_contains
    # HOF (O(|segments|·|dict|) per doc) and NOT a nested-loop join; the
    # only shuffle is the single doc_id-keyed re-group of kept segments
    bp_mat = spark.createDataFrame([(h,) for h in hits], "seg_hash long")
    plan = (
        TA.strip_boilerplate(docs, bp_mat)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    # exactly one exchange keyed on the doc side (the kept-segment
    # re-group); the only other permitted one is the tiny dictionary's
    # own dedup before broadcast
    assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "array_contains" not in plan, plan
    # dictionary cap: top-N by df wins deterministically, low-df entries drop
    capped = TA.boilerplate_segments(docs, min_df=3, max_dict_size=1).collect()
    assert len(capped) == 1 and capped[0].df == 3
    full = {r.seg_hash for r in TA.boilerplate_segments(docs, min_df=3).collect()}
    assert capped[0].seg_hash == min(full)  # df tie → lowest hash wins


def test_ngram_logprob(spark):
    """Repeated (predictable) bigrams score higher than rare ones; the
    fixed-point sum is exact and reproducible."""
    from spark_sql_on_hbase_spark.operators.classifier import ngram_logprob

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),   # one dominant bigram pattern
            (2, "c d e f g h i j"),   # all-singleton bigrams
            (3, "solo"),              # no bigrams → excluded
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ngram_logprob(docs).collect()}
    assert 3 not in out and set(out) == {1, 2}
    assert out[1].n_bigrams == 7 and out[2].n_bigrams == 7
    # "a b" has count 4 of 14 bigram tokens; every doc-2 bigram is 1/14-ish
    assert out[1].avg_logprob > out[2].avg_logprob
    rerun = {r.doc_id: r.logprob_fp for r in ngram_logprob(docs).collect()}
    assert rerun == {k: v.logprob_fp for k, v in out.items()}


def test_r5_operator_plan_shapes(spark):
    """Scale-shape guards: the r5 operators must plan broadcast/equi
    joins — never a cartesian product, and never a nested loop on the
    corpus side."""
    from spark_sql_on_hbase_spark.operators.classifier import (
        linear_score,
        make_hash_weights,
        ngram_logprob,
    )
    from spark_sql_on_hbase_spark.operators.decontam import contamination_flags
    from spark_sql_on_hbase_spark.operators.similarity import semantic_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan(contamination_flags(docs, docs.limit(50)))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "BroadcastHashJoin" in p  # benchmark gram index rides broadcast

    p = plan(semantic_dedup(emb, n_clusters=4, threshold=0.5))
    # the only nested-loop/cartesian allowed is the broadcast of the K
    # centroids (4 rows); the corpus-pair stage must be an equi-join
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p

    p = plan(linear_score(docs, make_hash_weights(spark, n_features=1 << 12), n_features=1 << 12))
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p, p

    p = plan(ngram_logprob(docs))
    assert "CartesianProduct" not in p, p

    p = plan(TA.duplicated_spans(docs))
    # dup-gram mark join: equi-join on the 60-bit hash key — never a
    # cartesian/nested loop, and never gram TEXT in an exchange (the
    # positive gh check alone is satisfiable by the aggregation exchange,
    # so the NEGATIVE check is what actually pins the 8-byte-key claim)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "hashpartitioning(gh" in p, p
    assert "hashpartitioning(gram" not in p and "hashpartitioning(_g" not in p, p


def test_null_text_degrades_not_crashes(spark):
    """NULL text must degrade to zero grams/segments everywhere the NGram
    shingler runs — the ML transformer NPEs on a NULL token array unless
    the array is coalesced (regression guard for the _shingles switch)."""
    from spark_sql_on_hbase_spark.operators.classifier import linear_score, make_hash_weights
    from spark_sql_on_hbase_spark.operators.decontam import contamination_flags

    docs = spark.createDataFrame(
        [(1, "real words in this document here"), (2, None)], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "unrelated eval words")], ["doc_id", "text"])
    out = {r.doc_id: r for r in contamination_flags(docs, bench, n=3).collect()}
    assert out[2].n_grams == 0 and not out[2].contaminated
    rep = {r.doc_id: r for r in TA.repetition_signals(docs).collect()}
    assert rep[2].n_tokens == 0 and rep[2].dup_2gram_frac == 0.0
    sb = {r.doc_id: r for r in TA.strip_boilerplate(
        docs, spark.createDataFrame([(123,)], "seg_hash long")).collect()}
    assert sb[2].clean_text == "" and sb[2].n_removed == 0
    clf = {r.doc_id: r for r in linear_score(docs, make_hash_weights(spark, 1 << 12), n_features=1 << 12).collect()}
    assert clf[1].n_features_hit > 0  # doc 2 has no features → absent is fine
    spans = TA.duplicated_spans(docs, k=2)
    assert spans.where(spans.doc_id == 2).count() == 0  # NULL text → no grams, no NPE
    st = {r.doc_id: r for r in TA.strip_spans(docs, spans).collect()}
    assert st[2].clean_text == "" and st[2].n_removed == 0


def test_truncate_tokens_and_corpus_stats(spark):
    from spark_sql_on_hbase_spark.operators.text_analysis import (
        corpus_stats,
        truncate_tokens,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)), "en", "s0"),
         (2, "short doc", "fr", "s1"),
         (3, "short doc", "fr", "s0")],
        ["doc_id", "text", "lang", "source"],
    )
    head = {r.doc_id: r for r in truncate_tokens(docs, 8, mode="head").collect()}
    assert head[1].trunc_text == " ".join(f"w{i}" for i in range(8)) and head[1].truncated
    assert head[2].trunc_text == "short doc" and not head[2].truncated
    ht = {r.doc_id: r for r in truncate_tokens(docs, 8, mode="head_tail").collect()}
    assert ht[1].trunc_text == "w0 w1 w2 w3 w26 w27 w28 w29"
    assert ht[2].trunc_text == "short doc"

    st = corpus_stats(docs).collect()[0]
    assert st.n_docs == 3 and st.n_tokens_total == 34
    assert st.n_langs == 2 and st.n_sources == 2
    assert st.n_exact_dup_docs == 1  # docs 2 and 3 share text


def test_corpus_stats_optional_metadata_columns(spark):
    """corpus_stats on a corpus without lang/source columns must degrade
    (0 distinct) instead of raising AnalysisException (ADVICE r5)."""
    bare = spark.createDataFrame([(1, "one two"), (2, "three")], ["doc_id", "text"])
    r = TA.corpus_stats(bare, lang_col=None, source_col=None).collect()[0]
    assert (r.n_docs, r.n_tokens_total, r.n_langs, r.n_sources) == (2, 3, 0, 0)
    renamed = bare.withColumn("language", F.lit("en"))
    r2 = TA.corpus_stats(renamed, lang_col="language", source_col=None).collect()[0]
    assert r2.n_langs == 1 and r2.n_sources == 0


@pytest.mark.slow  # r16 (VERDICT r15 #1): soak/fuzz sweep — --runslow lane
def test_ivf_index_append_equals_rebuild_and_drift_guard(spark, tmp_path):
    """r6 verdict #7: incremental IVF maintenance — only arriving vectors
    are assigned (against the persisted centroids) and appended to the
    partitioned inverted lists; append-then-query equals
    rebuild-then-query under the same centroids.  The drift guard
    compares each batch's mean nearest-centroid cosine against the
    persisted build baseline and recommends retraining when the batch
    distribution has moved away from the quantizer's fit."""
    from pyspark.sql import functions as F

    from spark_sql_on_hbase_spark.operators.similarity import (
        ivf_assign,
        ivf_build_index,
        ivf_index_append,
        ivf_load_index,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sub = emb.filter(F.col("vec_id") >= 100)
    batch = emb.filter(F.col("vec_id") < 100)
    idx_path = str(tmp_path / "ivf_idx")
    ivf_build_index(sub, idx_path, n_centroids=8, trained=True)

    res = ivf_index_append(batch, idx_path, drift_margin=0.2)
    assert res["appended"] == 100
    assert res["baseline_cos"] is not None and res["batch_cos"] is not None
    assert res["retrain_recommended"] is False

    # append == rebuild: querying the appended index must equal a fresh
    # full-corpus assignment under the SAME persisted centroids
    idx = ivf_load_index(spark, idx_path)
    assert idx[1].count() == emb.count()
    queries = emb.filter(F.col("vec_id").isin(3, 57, 211)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, queries, k=5, nprobe=4, index=idx).collect()
    }
    cent = idx[0]
    rebuilt = (cent, ivf_assign(emb, cent))
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, queries, k=5, nprobe=4, index=rebuilt).collect()
    }
    assert got == want

    # drift: a batch pointing away from the trained distribution
    # (negated vectors) must trip the retrain recommendation
    bad = batch.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    res_bad = ivf_index_append(bad, idx_path, drift_margin=0.03)
    assert res_bad["retrain_recommended"] is True
    assert res_bad["batch_cos"] < res_bad["baseline_cos"] - 0.03

    # pre-r7 index (no meta sidecar): append works, guard disabled, warns
    import shutil
    import warnings

    shutil.rmtree(f"{idx_path}/meta")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res_legacy = ivf_index_append(batch, idx_path)
    assert res_legacy["retrain_recommended"] is None
    assert any("drift" in str(x.message) for x in w)
