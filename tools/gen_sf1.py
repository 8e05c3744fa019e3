"""Generate an sf1 (10× sf0.1) soak dataset for the pipeline families.

/root/testdata is read-only and stops at sf0.1, so the ×10 soak step
(VERDICT r5 item 5) synthesizes its own documents/embeddings into
``/root/repo/.data/sf1`` with the same distributional shape as the
driver data (measured off sf0.1):

- documents: 50,000 rows; word-salad text over the sf0.1 vocabulary,
  8-110 tokens; langs ~{en:40%, others:15%}; 20 sources; ~0.2% exact
  duplicates and ~2% near-duplicates (1-2 token edits) so the dedup
  families have non-trivial work;
- embeddings: 20,000 unit-norm 64-dim vectors in 10 weak clusters
  (within-cluster cosine ≲0.5, matching the driver generator) plus ~1%
  perturbed near-copies (cosine ≳0.95) for the near-dup family.

The fact tables ``lineitem`` / ``orders`` are REAL sf1 (r6 verdict #8):
the sf0.1 tables replicated 10× with the order keys remapped into
disjoint ranges per replica (``k + rep·K``), so per-order structure,
join fan-outs to the (unchanged) customer/supplier/part dimensions, and
the value distributions all survive while row counts scale 10× — the
join/agg/window/TPC families get a true ×10 shuffle.  The small
dimension + events tables are symlinked from sf0.1 (dimensions don't
grow 10× per TPC-H scaling anyway; events families already soak via
the scaled documents).

Deterministic (seed 421).  The correctness gate compares Spark vs DuckDB
on these same files, so the generator only needs realistic shape, not
bit-parity with any official sf1.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "sf1")
SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
SEED = 421


def gen_documents(rng: np.random.Generator, n_docs: int = N_DOCS) -> pa.Table:
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
        if r[0]
    ]
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 100 and r < 0.002:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 100 and r < 0.022:  # near-duplicate: 1-2 token edits
            toks = texts[rng.integers(0, i)].split(" ")
            for _ in range(int(rng.integers(1, 3))):
                toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(toks))
            continue
        n = int(rng.integers(8, 111))
        texts.append(" ".join(vocab[j] for j in rng.integers(0, len(vocab), n)))
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(langs, n_docs, p=lang_p)),
            "source": pa.array([f"src{int(i)}" for i in rng.integers(0, 20, n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n_vecs: int = N_VECS) -> pa.Table:
    centers = rng.standard_normal((10, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vecs)
    noise = rng.standard_normal((n_vecs, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    alpha = 0.5  # within-cluster cosine ≈ alpha² ± spread, matching sf0.1
    vecs = alpha * centers[labels] + np.sqrt(1 - alpha * alpha) * noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # ~1% near-copies (cosine ≳0.95) for the embedding near-dup family
    n_copy = n_vecs // 100
    src_idx = rng.integers(0, n_vecs - n_copy, n_copy)
    dst_idx = np.arange(n_vecs - n_copy, n_vecs)
    pert = vecs[src_idx] + 0.12 * rng.standard_normal((n_copy, DIM)) / np.sqrt(DIM)
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    vecs[dst_idx] = pert
    labels[dst_idx] = labels[src_idx]
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


def gen_tpc_facts() -> tuple[int, int]:
    """Real sf1 fact tables: replicate sf0.1 orders/lineitem 10× with
    order keys remapped into disjoint per-replica ranges.  Orders↔
    lineitem referential integrity holds within each replica; the
    customer/supplier/part foreign keys are left unchanged, so dimension
    joins fan out 10× — exactly what a 10× TPC-H scale-up does to the
    probe side of those joins."""
    con = duckdb.connect()
    k = con.execute(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    con.execute(
        f"COPY (SELECT * REPLACE (o_orderkey + rep * {k} AS o_orderkey) "
        f"FROM '{SRC}/orders.parquet', range(10) t(rep)) "
        f"TO '{OUT}/orders.parquet' (FORMAT parquet)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE (l_orderkey + rep * {k} AS l_orderkey) "
        f"FROM '{SRC}/lineitem.parquet', range(10) t(rep)) "
        f"TO '{OUT}/lineitem.parquet' (FORMAT parquet)"
    )
    no, nl = (
        con.execute(f"SELECT count(*) FROM '{OUT}/orders.parquet'").fetchone()[0],
        con.execute(f"SELECT count(*) FROM '{OUT}/lineitem.parquet'").fetchone()[0],
    )
    return no, nl


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(rng), os.path.join(OUT, "embeddings.parquet"))
    for t in ["orders", "lineitem"]:  # pre-r7 symlinks → real files
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.islink(dst):
            os.unlink(dst)
    no, nl = gen_tpc_facts()
    for t in ["region", "nation", "customer", "supplier", "part", "events"]:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    print(
        f"sf1 soak data at {OUT}: {N_DOCS} docs, {N_VECS} vectors, "
        f"{no} orders, {nl} lineitem"
    )


if __name__ == "__main__":
    main()
