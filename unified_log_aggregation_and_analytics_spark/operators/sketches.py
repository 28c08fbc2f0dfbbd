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


# --------------------------------------------------------------------
# Heavy hitters: distributed Misra-Gries summaries.
# --------------------------------------------------------------------

def mg_update(counts: dict, arr, capacity: int, chunk: int) -> None:
    """ONE Misra-Gries accumulation step over a key array: chunked
    value_counts merge, then (capacity+1)-th-largest decrement with
    eviction whenever the counter set overflows. The decrement rule
    both certified error bounds depend on lives in exactly this one
    place — the batch summary and the streaming state update share it
    (a divergent copy would silently break the documented
    streaming ≡ batch-summary-lifted-into-state equivalence)."""
    import pandas as pd

    for start in range(0, len(arr), chunk):
        vc = pd.Series(arr[start : start + chunk]).value_counts()
        for key, c in vc.items():
            counts[key] = counts.get(key, 0) + int(c)
        if len(counts) > capacity:
            dec = sorted(counts.values(), reverse=True)[capacity]
            kept = {key: c - dec for key, c in counts.items() if c > dec}
            counts.clear()
            counts.update(kept)


def misra_gries_summary(
    df: DataFrame,
    key_col: str,
    capacity: int = 64,
    n_shards: int = 16,
    chunk: int = 4096,
) -> DataFrame:
    """Bounded-memory heavy-hitter summary (Misra-Gries / mergeable
    summaries, Agarwal et al. PODS'12): per shard, counters over at
    most ``capacity`` keys; whenever the counter set overflows, every
    counter drops by the (capacity+1)-th largest value and non-positive
    counters evict.

    Guarantees (per shard of n rows, proven by the standard charging
    argument; every key lives wholly in one shard because sharding is
    BY KEY HASH, and any chunking/interleaving of the updates
    preserves the bound — the mergeable-summaries result):
      * est <= true  (counts only ever undercount)
      * true - est <= n_shard / (capacity + 1)
      * every key with true > n_shard/(capacity+1) IS in the summary

    Plan: repartition ON THE SHARD KEY, then ``mapInPandas`` — the
    Arrow batches of each partition STREAM through per-shard MG
    states (``mg_update``, shared with the streaming operator), so
    peak memory is one Arrow batch + the bounded counter dicts.
    ``groupBy().applyInPandas`` would be wrong here: it materializes
    an entire shard as one pandas frame, O(shard rows) memory —
    precisely the blow-up this operator exists to avoid at 100 TB of
    high-cardinality keys. Output: (key, est, shard, shard_n); a
    shard whose final overflow evicted every counter still reports
    its stream length via one null-key sentinel row (shard_n is part
    of the summary contract and feeds the certificate's global n).
    """
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("k", StringType()),
            StructField("est", LongType()),
            StructField("shard", IntegerType()),
            StructField("shard_n", LongType()),
        ]
    )

    # NULL keys are excluded by contract: they WOULD hash to a valid
    # shard (xxhash64(null) returns the seed), but value_counts drops
    # NaN keys silently — miscounting shard_n — and a genuine
    # null-key counter row would be indistinguishable from the
    # full-eviction sentinel below. The certificate's exact side
    # applies the same filter, keeping both sides of the bound in
    # agreement; count nulls upstream if they matter.
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("k"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    ).repartition(n_shards, "shard")

    def mg(batches):
        states: dict[int, dict] = {}
        ns: dict[int, int] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("shard"):
                s = int(shard)
                arr = grp["k"].to_numpy()
                ns[s] = ns.get(s, 0) + len(arr)
                mg_update(states.setdefault(s, {}), arr, capacity, chunk)
        for shard, counts in states.items():
            if not counts:
                yield pd.DataFrame(
                    {"k": [None], "est": [0], "shard": [shard], "shard_n": [ns[shard]]}
                )
                continue
            yield pd.DataFrame(
                {
                    "k": list(counts.keys()),
                    "est": list(counts.values()),
                    "shard": shard,
                    "shard_n": ns[shard],
                }
            )

    return keyed.mapInPandas(mg, schema=out_schema)


def heavy_hitters_certificate(
    df: DataFrame,
    key_col: str,
    capacity: int = 64,
    n_shards: int = 16,
) -> DataFrame:
    """Oracle-checkable certificate for the MG summary (the approx-
    family pattern, like q07b): emit every TRUE heavy hitter (global
    frequency > n/(capacity+1) — a condition an independent engine
    can compute exactly) with booleans asserting the summary captured
    it and its estimate honored the MG error bound. Guaranteed TRUE
    by theory; any implementation bug flips a flag and fails the hash
    match. The exact side here is one groupBy — affordable at test
    scale; at 100 TB only the summary runs.

    The summary frame is persisted: it is BOUNDED by construction
    (<= capacity x n_shards rows), and the certificate references it
    twice (total-n derivation + the capture join) — caching a few
    hundred rows beats recomputing the corpus pass, at any scale. The
    global n comes from the summary's own per-shard ``shard_n``
    (sum over distinct shards) — an MG summary carries its stream
    length as part of the mergeable-summary contract, and using it
    here means the oracle's exact n cross-checks shard_n through the
    heavy-set membership: a miscounted shard shifts the threshold and
    fails the hash match."""
    summary = misra_gries_summary(df, key_col, capacity, n_shards).persist()
    try:
        return _hh_certify(df, summary, key_col, capacity).localCheckpoint()
        # ^ materialize NOW — the certificate is bounded (at most
        # `capacity` true heavy hitters can exist, by definition of
        # the n/(capacity+1) threshold), so checkpointing is O(capacity)
        # and lets the summary cache drop here instead of leaking
        # across repeated calls (round-5 ADVICE).
    finally:
        summary.unpersist()


def _hh_certify(df, summary, key_col: str, capacity: int):
    exact = (
        df.filter(F.col(key_col).isNotNull())  # the summary's null-
        # exclusion contract, mirrored so n and the heavy set agree
        .select(F.col(key_col).cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    total = (
        summary.select("shard", "shard_n").distinct().agg(F.sum("shard_n").alias("n"))
    )
    heavy = (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("true_cnt") * (capacity + 1) > F.col("n"))
    )
    j = heavy.join(summary, "k", "left")
    return j.select(
        "k",
        "true_cnt",
        F.col("est").isNotNull().alias("captured"),
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("true_cnt"))
            & (
                (F.col("true_cnt") - F.col("est")) * (capacity + 1)
                <= F.col("shard_n")
            )
        ).alias("within_bound"),
    ).orderBy("k")


# --------------------------------------------------------------------
# Mergeable quantile cube: fixed-bin histogram sketches.
# --------------------------------------------------------------------

def build_quantile_cube(
    df: DataFrame,
    path: str,
    dims: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> None:
    """Materialize per-cell QUANTILE sketches as fixed-bin histograms:
    one row per (dims..., bin) carrying the bin population. The bin
    edges are FIXED at build time (``lo``/``hi``/``n_bins`` stored in
    the cube), which is what makes cells mergeable: any slice/rollup
    of the cube sums bin counts — union of histograms IS the histogram
    of the union, exactly (integer addition, no estimator drift; the
    t-digest/KLL trade of adaptive bins for tighter tails is
    deliberately not taken so merges stay exact and engine-portable).

    Percentile answers from the merged histogram are exact to within
    one bin width ((hi-lo)/n_bins) — the certificate entry pins that
    bound against an independent exact engine. Out-of-range values
    clamp into the edge bins (their quantile contribution stays
    correct; only their position error exceeds a bin width).

    One hash aggregation, map-side combined; output |cells| x n_bins
    rows of three integers — a day of raw events answers any later
    percentile slice from KBs."""
    span = hi - lo
    b = F.floor(((F.col(value_col) - F.lit(lo)) * F.lit(n_bins)) / F.lit(span))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    (
        df.groupBy(*dims, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumns(
            {
                "lo": F.lit(float(lo)),
                "hi": F.lit(float(hi)),
                "n_bins": F.lit(n_bins),
            }
        )
        .write.mode("append")
        .parquet(path)
    )


def quantile_from_cube(
    spark: SparkSession,
    path: str,
    q: float,
    group_by: list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Answer a percentile over any slice/rollup of the cube: filter
    cells, sum bin counts, walk the cumulative histogram to the first
    bin whose cumulative population reaches ceil(q * total), and
    report that bin's bounds plus midpoint estimate. The window walk
    runs over <= n_bins rows per group — query cost is |matching
    cells|, independent of raw volume.

    Count-based quantile semantics (the k-th smallest value, k =
    ceil(q*n)): the true k-th value lies in [bin_lo, bin_hi) of the
    reported bin by construction.

    Fails fast on a cube holding MIXED bin configurations: merging is
    only exact because every cell shares (lo, hi, n_bins) — two
    builds with different ranges appended to one path would interleave
    incompatible bins through the cumulative walk and report garbage
    silently. The config check reads the few distinct config rows,
    never the cell population."""
    from pyspark.sql import Window

    cube = spark.read.parquet(path)
    if where:
        cube = cube.filter(where)
    cfgs = cube.select("lo", "hi", "n_bins").distinct().limit(3).collect()
    if len(cfgs) > 1:
        raise ValueError(
            f"cube at {path} holds mixed bin configs {sorted(map(tuple, cfgs))}; "
            "histograms are only mergeable within one (lo, hi, n_bins) — "
            "rebuild, or filter to a single config with `where`"
        )
    keys = group_by or []
    merged = cube.groupBy(*keys, "bin", "lo", "hi", "n_bins").agg(
        F.sum("cnt").alias("cnt")
    )
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*keys)
    cum = merged.withColumns(
        {
            "cum": F.sum("cnt").over(w),
            "total": F.sum("cnt").over(wt),
        }
    )
    k = F.ceil(F.lit(q) * F.col("total")).cast("long")
    hit = cum.filter(F.col("cum") >= k)
    first = Window.partitionBy(*keys).orderBy("bin")
    width = (F.col("hi") - F.col("lo")) / F.col("n_bins")
    return (
        hit.withColumn("_rk", F.row_number().over(first))
        .filter(F.col("_rk") == 1)
        .select(
            *keys,
            F.lit(q).alias("q"),
            F.col("total").cast("long").alias("n"),
            F.col("bin"),
            (F.col("lo") + F.col("bin") * width).alias("bin_lo"),
            (F.col("lo") + (F.col("bin") + 1) * width).alias("bin_hi"),
            (F.col("lo") + (F.col("bin") + F.lit(0.5)) * width).alias("est"),
        )
    )
