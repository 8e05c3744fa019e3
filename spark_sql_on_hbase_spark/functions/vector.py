"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (JVM-side, whole-stage codegen), no UDFs.

At 100 TB these expressions run inside the scan/join stages; the usual
pattern is `broadcast(queries) CROSS JOIN corpus` with these columns, so
the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (computed in DOUBLE)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a, b) -> Column:
    """cos(a,b) in [-1,1]; NULL if either norm is 0 (try_divide — plain
    `/` THROWS under Spark 4 ANSI on a zero-norm vector); NaN inputs
    propagate as NaN."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_similarity_batch(a, b) -> Column:
    """Vectorized twin of :func:`cosine_similarity` — an Arrow
    ``pandas_udf`` whose numpy kernel accumulates dot and norms
    SEQUENTIALLY over dimensions in float64, i.e. the exact op order of
    the HOF fold above (and of the DuckDB ``list_sum`` oracles), so the
    resulting doubles are bit-identical (pinned by pytest).  Use this in
    per-candidate rerank loops where the interpreted HOF evaluation is
    the CPU bottleneck; the HOF form stays for one-off expressions.
    """
    import numpy as np
    import pandas as pd

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b

    def _cos(ca, cb):  # no type hints: __future__ annotations breaks inference
        va = ca.reset_index(drop=True).to_numpy()
        vb = cb.reset_index(drop=True).to_numpy()
        n = len(va)
        out = np.full(n, np.nan)
        zero_div = np.zeros(n, dtype=bool)
        null = (ca.isna() | cb.isna()).to_numpy()
        lens = np.array(
            [-1 if m else (len(x) if len(x) == len(y) else -2)
             for x, y, m in zip(va, vb, null)],
            dtype=np.int64,
        )
        for d in np.unique(lens[lens >= 0]) if n else []:
            pos = np.nonzero(lens == d)[0]
            # one C-level stack+cast per uniform-length group — a per-row
            # assignment loop here dominated the whole kernel's runtime
            A = np.stack(va[pos]).astype(np.float64, copy=False)
            B = np.stack(vb[pos]).astype(np.float64, copy=False)
            dt = np.zeros(len(pos)); na = np.zeros(len(pos)); nb = np.zeros(len(pos))
            for i in range(d):  # sequential == fold order → bit-identical
                dt += A[:, i] * B[:, i]
                na += A[:, i] * A[:, i]
                nb += B[:, i] * B[:, i]
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[pos] = dt / denom
            # mirror try_divide: a ZERO denominator → NULL; NaN from NaN
            # inputs propagates as NaN exactly like the HOF twin
            zero_div[pos] = denom == 0.0
        # FloatingArray with an explicit mask: NULL and NaN must remain
        # DISTINCT through Arrow (an object Series folds NaN into null)
        mask = null | (lens == -2) | zero_div
        return pd.Series(pd.arrays.FloatingArray(out, mask))

    return F.pandas_udf(_cos, "double")(a, b)
