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
    """cos(a,b) in [-1,1]; NULL if either norm is 0."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
