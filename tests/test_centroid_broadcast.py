"""r14: centroid matrices ship via TorrentBroadcast, not UDF closures.

VERDICT r13 item 6: `_assign_cells_top2` and `ivf_assign` used to
capture the K×d centroid matrix in the pandas_udf closure — ~25 MB
pickled into EVERY UDF command at K=4096, d=768.  Both kernels are now
built by module-level factories that close over only the
`SparkContext.broadcast` handle (+ two int scalars for ivf), so the
matrix rides TorrentBroadcast once per executor.

Tests here prove it two ways: (a) direct closure inspection — no
ndarray-like object above a tiny bound in either kernel's cells — and
(b) end-to-end value parity of `ivf_assign` against the pre-broadcast
reference arithmetic on a deterministic corpus.
"""

import numpy as np
import pytest

from spark_sql_on_hbase_spark.operators.similarity import (
    _build_ivf_score_kernel,
    _build_top2_kernel,
    ivf_assign,
)


def _closure_payload_bytes(fn):
    """Upper-bound the bytes of array payloads captured by fn's closure."""
    total = 0
    for cell in fn.__closure__ or ():
        v = cell.cell_contents
        if isinstance(v, np.ndarray):
            total += v.nbytes
        elif isinstance(v, (tuple, list)):
            for x in v:
                if isinstance(x, np.ndarray):
                    total += x.nbytes
    return total


@pytest.fixture(scope="module")
def big_broadcast(spark):
    # K=4096, d=768 float64 — the exact shape the r13 verdict flagged
    # (~25 MB); if either kernel captured it, the assertion below trips.
    cmat = np.ones((4096, 768), dtype=np.float64)
    cids = np.arange(4096, dtype=np.int64)
    sqrt_nb = np.sqrt(np.full(4096, 768.0))
    bc_top2 = spark.sparkContext.broadcast((cmat, cids))
    bc_ivf = spark.sparkContext.broadcast((cmat, sqrt_nb))
    yield bc_top2, bc_ivf
    bc_top2.unpersist()
    bc_ivf.unpersist()


def test_top2_kernel_closure_holds_no_matrix(big_broadcast):
    bc_top2, _ = big_broadcast
    fn = _build_top2_kernel(bc_top2)
    assert _closure_payload_bytes(fn) < 1024, (
        "top2 kernel closure captured an array payload — the centroid "
        "matrix must ride the Broadcast handle only"
    )
    names = set(fn.__code__.co_freevars)
    assert "bc" in names and not names - {"bc", "np", "pd"}, names


def test_ivf_kernel_closure_holds_no_matrix(big_broadcast):
    _, bc_ivf = big_broadcast
    fn = _build_ivf_score_kernel(bc_ivf, 4096, 768)
    assert _closure_payload_bytes(fn) < 1024
    names = set(fn.__code__.co_freevars)
    assert "bc" in names and not names - {"bc", "k_n", "d_c", "np", "pd"}, names


def test_ivf_assign_values_unchanged(spark):
    """End-to-end: broadcast-handle kernel reproduces the sequential-
    fold cosine argmax exactly (same tie semantics: cos DESC, id ASC)."""
    rng = np.random.RandomState(7)
    vec_rows = [
        (i, [float(x) for x in rng.randn(8)]) for i in range(64)
    ] + [(64, None), (65, [1.0, 2.0])]  # NULL + length-mismatch rows
    cent_rows = [(j, [float(x) for x in rng.randn(8)]) for j in range(4)]
    vecs = spark.createDataFrame(vec_rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        cent_rows, "centroid_id long, centroid array<double>"
    )
    got = {
        r.vec_id: r.cluster_id
        for r in ivf_assign(vecs, cents, with_cos=False).collect()
    }
    # reference arithmetic: sequential-dim float64 fold, round-half-up 4dp
    cmat = np.array([c for _, c in cent_rows])
    nb = np.zeros(4)
    for i in range(8):
        nb += cmat[:, i] * cmat[:, i]
    sqrt_nb = np.sqrt(nb)
    from decimal import ROUND_HALF_UP, Decimal

    for vid, v in vec_rows:
        if v is None or len(v) != 8:
            # all-NULL scores → max_by struct tiebreak lands on the
            # lowest centroid id (pre-broadcast semantics, oracle-pinned)
            assert got[vid] == 0
            continue
        va = np.array(v)
        dt = np.zeros(4)
        na = 0.0
        for i in range(8):
            dt += va[i] * cmat[:, i]
            na += va[i] * va[i]
        cos = dt / (np.sqrt(na) * sqrt_nb)
        r4 = [
            float(Decimal(repr(c)).quantize(Decimal("0.0001"), ROUND_HALF_UP))
            for c in cos
        ]
        best = max(range(4), key=lambda j: (r4[j], -j))
        assert got[vid] == best, (vid, r4, got[vid])
