"""100x duplicate-heavy scale probe for the span-level ExactSubstr
family (VERDICT r7 next-round item 5).

Data: the r4 worst-case recipe — sf0.1 documents replicated R times
BYTE-IDENTICAL (doc_id offset only). Every k-gram then occurs >= R
times corpus-wide, so EVERY gram position is flagged: the census'
hit stream is maximal (one row per gram position in the whole
corpus) and the edit must rebuild every document with its entire
body covered. This is deliberately the opposite of
tools/make_scale_data.py (which salts text to keep duplicate
structure realistic): here quadratic-by-construction pressure is
the point, as in the r4 MinHash/CC 100x probe (SURVEY section 6).

Census worst case: hits ~ total gram positions (~500k docs x
~doc_len rows through the interval-merge window). Edit worst case
under full coverage collapses to n_spans=1 per doc — the easy side
of O(doc_len x n_spans) — so the probe ALSO reports the per-doc
span-count distribution of the natural sf0.1 corpus at 10x, where
spans are many and short, to bound the other axis.

Shuffle sizes come from the Spark UI REST API (sum of per-stage
shuffle read/write bytes between probe marks), as VERDICT r8 item 5
asks.

Usage: python tools/probe_span_100x.py [replicas] (default 100)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/span100x")


def make_data(replicas: int) -> str:
    dst = os.path.join(WORK, f"dup{replicas}x")
    out = os.path.join(dst, "documents.parquet")
    if os.path.exists(out):
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    n = con.sql(f"SELECT MAX(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    parts = " UNION ALL ".join(
        f"SELECT doc_id + {k * n} AS doc_id, text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet'"
        for k in range(replicas)
    )
    con.sql(f"COPY ({parts}) TO '{out}' (FORMAT PARQUET)")
    return dst


def shuffle_totals(ui: str) -> tuple[int, int]:
    """Sum shuffle read/write bytes over all completed stages."""
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    data_dir = make_data(replicas)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "64")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("span100x")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    docs = spark.read.parquet(os.path.join(data_dir, "documents.parquet"))
    n_docs = docs.count()
    out: dict = {"replicas": replicas, "n_docs": n_docs, "src": SRC}

    which = os.environ.get("SPARK_GRAFT_OPS", "census,edit").split(",")
    for name, fn in (
        ("census", lambda d: duplicated_spans(d, k=10, min_count=2)),
        ("edit", lambda d: remove_duplicated_spans(d, k=10, min_count=2)),
    ):
        if name not in which:
            continue
        r0, w0 = shuffle_totals(ui)
        t0 = time.monotonic()
        res = fn(docs)
        agg = res.agg(
            F.count(F.lit(1)).alias("rows"),
            (
                F.sum("dup_tokens") if name == "census" else F.sum("kept_tokens")
            ).alias("tok"),
            (F.sum("n_spans") if name == "census" else F.lit(None)).alias("spans"),
        ).collect()[0]
        dt = time.monotonic() - t0
        r1, w1 = shuffle_totals(ui)
        out[name] = {
            "sec": round(dt, 2),
            "rows": agg["rows"],
            "tokens": int(agg["tok"] or 0),
            "spans": int(agg["spans"]) if agg["spans"] is not None else None,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)

    # other axis of the edit's O(doc_len x n_spans): natural-corpus
    # span-count distribution at the plain sf0.1 (many short spans)
    nat = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    cen = duplicated_spans(nat, k=10, min_count=2)
    dist = cen.agg(
        F.max("n_spans").alias("max_spans"),
        F.expr("percentile_approx(n_spans, 0.99)").alias("p99_spans"),
        F.avg("n_spans").alias("avg_spans"),
    ).collect()[0]
    out["natural_span_distribution_sf0.1"] = {
        "max_spans": int(dist["max_spans"]),
        "p99_spans": int(dist["p99_spans"]),
        "avg_spans": round(float(dist["avg_spans"]), 2),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
