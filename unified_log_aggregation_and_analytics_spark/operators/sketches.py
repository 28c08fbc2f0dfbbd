"""Mergeable sketch cubes (Q7 at warehouse scale): persist
pre-aggregated HyperLogLog sketches per (dimension) cell ONCE, then
answer distinct-count questions over ANY slice by merging sketches —
never re-scanning raw data.

This is the pattern that makes interactive cardinality analytics
possible at 100 TB (the reference's Dashboards cardinality aggs run
the same way inside OpenSearch): a day of raw events compresses to
|cells| sketch rows of a few KB each; "distinct users for sources
A,B over last week" reads 14 sketch rows and unions them in
microseconds. Sketches are MERGEABLE — union(sketch(X), sketch(Y)) ==
sketch(X ∪ Y) — so any rollup of the persisted cube is exact with
respect to the sketch's own estimate (asserted in tests, not just
approximately: merging the cube equals sketching the union). Accuracy
is the standard HLL ~1-2% at lgK=12.

Spark-native: `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` are built-in (Apache DataSketches under the
hood), so the whole path is JVM-side codegen aggregation — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_distinct_sketch_cube(
    df: DataFrame,
    path: str,
    dims: list[str],
    value_col: str,
    lg_k: int = 12,
) -> None:
    """Materialize the per-cell HLL sketch cube: one row per distinct
    ``dims`` combination carrying the binary sketch of ``value_col``.
    One hash aggregation with map-side partial merge (sketches combine
    associatively), output size = |cells| x ~2^lg_k bytes — the raw
    table never needs re-reading for cardinality questions again.
    Refresh is incremental by construction: sketch today's partition
    and append; merges at query time absorb it."""
    (
        df.groupBy(*dims)
        .agg(F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("sketch"))
        .write.mode("append")
        .parquet(path)
    )


def sketch_distinct(
    spark: SparkSession,
    path: str,
    group_by: list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Answer a distinct-count over any slice/rollup of the cube:
    filter cells, merge their sketches (`hll_union_agg`), estimate.
    Reads |matching cells| sketch rows — query cost is independent of
    the raw data volume."""
    cube = spark.read.parquet(path)
    if where:
        cube = cube.filter(where)
    keys = group_by or []
    agg = F.hll_sketch_estimate(F.expr("hll_union_agg(sketch)")).alias("approx_distinct")
    if keys:
        return cube.groupBy(*keys).agg(agg)
    return cube.agg(agg)
