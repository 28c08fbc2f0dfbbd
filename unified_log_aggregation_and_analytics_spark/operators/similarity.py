"""Similarity search over embedding columns (X3).

Two tiers:
- ``knn_brute_force``: exact top-k cosine against a broadcast query
  vector. The scan is embarrassingly parallel (map + TakeOrdered); at
  100 TB this is one pass over the embedding column with no shuffle —
  the right baseline, and often the right answer when the query set is
  small.
- ``ann_lsh_topk``: random-hyperplane LSH. Sign-bit sketches bucket
  vectors; only the query's bucket (plus optional multi-probe
  neighbors) is scanned. The hyperplanes are generated from a fixed
  seed so results are reproducible. This is the scale path when the
  query volume is high: candidate generation becomes a bucket-key
  equi-join instead of a full scan.

All vector math is zip_with/aggregate higher-order expressions
(functions/vectors.py) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.functions.vectors import cosine_similarity


def knn_brute_force(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity against one query vector.

    The query is a literal array (broadcast by construction); the plan
    is scan -> project(cosine) -> TakeOrderedAndProject. Deterministic:
    similarity rounded to 6 decimals with id tie-break."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def sign_sketch(vec_col: Column | str, planes: np.ndarray) -> Column:
    """LSH bucket id: sign bits of dot products with fixed random
    hyperplanes, packed into a long. ``planes`` is (n_bits, dim)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for bit, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(c, plane_col, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.shiftleft(F.when(dot > 0, 1).otherwise(0).cast("long"), bit))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_planes(dim: int, n_bits: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign_sketch."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    seed: int = 42,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows whose LSH bucket is within
    ``multiprobe_bits`` Hamming distance of the query's bucket.

    At scale the bucket column is precomputed and partitioned-by, so
    this becomes partition pruning; here it is a filter the scan
    evaluates cheaply (8 fused dot products per row)."""
    planes = lsh_planes(len(query_vec), n_bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ q) > 0))
    bucket = sign_sketch(vec_col, planes)
    candidates = df.filter(
        F.bit_count(bucket.bitwiseXOR(F.lit(q_bucket))) <= multiprobe_bits
    )
    return knn_brute_force(candidates, query_vec, k, vec_col, id_col)
