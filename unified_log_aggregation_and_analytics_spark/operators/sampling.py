"""Deterministic sampling / dataset splitting for training pipelines.

``df.sample``/``sampleBy`` draw from an RNG — resampling on retry or
on a different partitioning changes membership, which poisons
train/test hygiene at 100 TB (a document must never migrate between
splits across runs). Hash-based splitting fixes membership forever:
the split is a pure function of the id, identical on every engine,
every retry, every cluster size, and needs no shuffle — it is a
map-only projection the scan fuses into codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): first 8 md5 hex digits of the
    id's string form, as an integer, mod n_buckets. md5 (not
    xxhash64) keeps the bucket reproducible in any engine."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % n_buckets
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Assign a ``split`` column from integer percentage weights, e.g.
    ``{"train": 80, "val": 10, "test": 10}`` (must sum to 100).
    Cumulative bucket ranges: train=[0,80), val=[80,90), test=[90,100).
    """
    splits = splits or {"train": 80, "val": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError("split weights must sum to 100")
    bucket = hash_bucket(id_col)
    expr = None
    hi = 0
    for name, weight in splits.items():
        hi += weight
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)
