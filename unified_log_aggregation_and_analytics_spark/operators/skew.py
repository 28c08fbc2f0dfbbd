"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; these explicit tools cover what AQE cannot:

- ``salted_join``: a broadcast-ineligible join where one key dominates
  (the reference's workload has exactly this shape: one chatty host /
  request id producing most log lines). The big side gets a random
  salt in [0, n_salts); the small side is replicated once per salt;
  the join key becomes (key, salt), spreading the hot key across
  n_salts tasks.
- ``two_phase_count_distinct``: exact COUNT(DISTINCT x) per hot key
  without funneling every x of that key through one task — phase one
  dedups on (key, x) (spread across tasks by the pair hash), phase
  two counts rows per key.

Both are semantics-preserving rewrites — tests assert equality with
the naive plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with hot-key salting. ``small`` is replicated
    ``n_salts`` times (only viable when it is small-ish but above the
    broadcast threshold); each ``big`` row picks one replica, so a hot
    key's probe work spreads over ``n_salts`` tasks instead of one.
    The salt is uniform random (seeded): any assignment is correct
    because every replica carries the full small side for its key.

    Only joins that preserve small-side multiplicity under replication
    are allowed: inner/left/left_semi/left_anti (from the big side).
    ``right``/``full`` would emit each unmatched small-side row once
    per salt replica, so they are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} is not semantics-preserving — the "
            "replicated small side would duplicate unmatched rows; use "
            "inner/left/semi/anti (from the big side)."
        )
    salts = F.array(*[F.lit(i).cast("int") for i in range(n_salts)])
    big_salted = big.withColumn("_salt", F.floor(F.rand(seed) * n_salts).cast("int"))
    small_rep = small.withColumn("_salt", F.explode(salts))
    return big_salted.join(small_rep, [on, "_salt"], how).drop("_salt")


def two_phase_count_distinct(
    df: DataFrame, key_col: str, distinct_col: str
) -> DataFrame:
    """Exact per-key distinct count, skew-safe: shuffle one is keyed by
    (key, value) — a hot key's values spread across tasks — and the
    final count per key aggregates pre-deduped rows.
    Returns (key_col, n_distinct)."""
    return (
        df.select(key_col, distinct_col)
        .distinct()
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
