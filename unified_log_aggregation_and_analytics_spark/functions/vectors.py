"""Vector math over ``array<float>`` columns, JVM-side.

Used by the similarity-search operators (X3). Everything here is
``zip_with``/``aggregate`` higher-order functions — no Python UDFs, so
the expressions stay inside whole-stage codegen and scale linearly
with executor count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
