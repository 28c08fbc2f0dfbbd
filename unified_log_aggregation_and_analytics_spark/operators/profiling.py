"""Dataset profiling (the dataset-card stage of a training pipeline):
per-column completeness, cardinality, and range in a form both
humans and downstream validation rules consume.

Scale shape: ONE pass over the table computing every column's
aggregates together (a single hash aggregation — no per-column jobs),
then a map-only unpivot to (column, metric...) rows. Exact
count_distinct per column would force Spark's Expand-based multi-
distinct plan (one duplicated input stream per distinct column), so
the scale path uses approx_count_distinct (HLL, ~2%) — the
``exact=True`` twin exists for oracle checks and small tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str], exact: bool = False) -> DataFrame:
    """One-pass per-column profile: row count, nulls, (approx)
    distincts, lexicographic min/max (values cast to string so one
    schema fits every column type). Returns one row per column:
    ``(column, n_rows, n_null, n_distinct, min_value, max_value)``."""
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            distinct(c).alias(f"{c}__dist"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__null").cast("long").alias("n_null"),
                F.col(f"{c}__dist").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def mixture_drift(
    df_a: DataFrame, df_b: DataFrame, stratum_col: str
) -> DataFrame:
    """Distribution-drift monitor between two corpus snapshots (or a
    corpus and its filtered self): per-stratum shares side by side
    plus the stratum's Population-Stability-Index contribution
    ``(share_a - share_b) * ln(share_a / share_b)`` — the standard
    "did this pipeline stage skew my mixture" alarm (sum > 0.1 is the
    conventional review threshold; a stratum's own row says WHERE the
    shift came from).

    Plan shape: two stratum-cardinality aggregations (tiny), a full
    outer join on the stratum key, map-only share/PSI math with
    epsilon smoothing for one-sided strata. The corpora are each
    scanned once; nothing corpus-sized shuffles. PSI rounds to 6
    decimals so libm's last-ulp ln differences can't break
    cross-engine equality."""
    eps = 1e-9
    a = df_a.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_a"))
    b = df_b.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_b"))
    joined = a.join(b, stratum_col, "full_outer").fillna(0, ["n_a", "n_b"])
    totals = joined.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    out = joined.crossJoin(F.broadcast(totals))
    share_a = F.col("n_a").cast("double") / F.col("t_a")
    share_b = F.col("n_b").cast("double") / F.col("t_b")
    psi = (share_a - share_b) * F.log((share_a + eps) / (share_b + eps))
    return out.select(
        stratum_col,
        F.col("n_a"),
        F.col("n_b"),
        F.round(share_a, 6).alias("share_a"),
        F.round(share_b, 6).alias("share_b"),
        F.round(psi, 6).alias("psi"),
    )


def mixture_drift_flagged(
    df: DataFrame, flag_col: str, stratum_col: str
) -> DataFrame:
    """mixture_drift specialized for the common case where snapshot B
    is a FLAGGED SUBSET of snapshot A (a filter stage's survivors):
    one corpus pass computes per-stratum (n_a, n_b) together, and the
    totals come from a 1-row aggregate over that tiny relation with
    the strata carried alongside via collect_list (the same
    no-rescan trick as sampling.mixture_sample) — no second corpus
    scan, no cross join, no global window. Share/PSI math identical
    to mixture_drift."""
    eps = 1e-9
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum(F.col(flag_col).cast("long")).alias("n_b"),
    )
    exploded = (
        counts.agg(
            F.sum("n_a").alias("t_a"),
            F.sum("n_b").alias("t_b"),
            F.collect_list(F.struct(stratum_col, "n_a", "n_b")).alias("strata"),
        )
        .select("t_a", "t_b", F.explode("strata").alias("s"))
    )
    share_a = F.col("s.n_a").cast("double") / F.col("t_a")
    share_b = F.col("s.n_b").cast("double") / F.col("t_b")
    psi = (share_a - share_b) * F.log((share_a + eps) / (share_b + eps))
    return exploded.select(
        F.col(f"s.{stratum_col}").alias(stratum_col),
        F.col("s.n_a").alias("n_a"),
        F.col("s.n_b").alias("n_b"),
        F.round(share_a, 6).alias("share_a"),
        F.round(share_b, 6).alias("share_b"),
        F.round(psi, 6).alias("psi"),
    )
