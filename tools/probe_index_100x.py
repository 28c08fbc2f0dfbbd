"""100x persisted-vector-index lifecycle probe (VERDICT r11 item 7).

The one scale family previously measured only to 10x/80-trigger: the
persisted ANN indexes' build -> probe -> append -> merge lifecycle at
500 k - 1 M vectors, the span-family 100x table's protocol applied to
operators/ann_index.py.

Data: sf0.1 embeddings (2 000 x dim 64) replicated R times with
norm-preserving, deterministic perturbations — replica k rolls each
vector's components by k mod 64 positions AND flips component signs
by the bit pattern of k // 64, so replicas stay distinct far beyond
the 64-rotation horizon (tools/make_scale_data.py's rotation alone
would repeat exactly every 64 replicas and stack identical vectors
into the same cells, measuring the synthetic data rather than the
engine). Norms are preserved, so per-cell populations grow ~linearly
— the shape a real corpus gives the index.

Measured per family (IVF / SQ8 / IVF-SQ8) and size:
- build wall (one Arrow assignment/encode pass + partitioned write)
- cold + min-of-5 warm probe latency
- one fenced streaming delta append + merge_index_delta wall, and the
  probe latency after the merge (the maintenance cadence cost)
- for IVF at 500 k: probe latency across n_centroids in {16, 64, 256}
  — the knob that bounds rows-read-per-probe (~ 4/n_centroids of the
  corpus at n_probe=4); the table names its effect directly.

Usage: python tools/probe_index_100x.py [n_vectors ...]
       (default: 500000 1000000)
Prints one JSON line per (family, size) row plus a closing summary —
paste the table into SURVEY section 6 next to the span-family one.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/index100x")


def make_vectors(n: int) -> str:
    """Replicate the sf0.1 embeddings to n vectors (see module doc)."""
    out = os.path.join(WORK, f"vec{n}", "embeddings.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SRC}/embeddings.parquet' "
        "WHERE vec_id <> 0 ORDER BY vec_id"
    ).fetchall()
    base = np.array([np.asarray(e, dtype=np.float32) for _, e in rows])
    nb, d = base.shape
    replicas = (n + nb - 1) // nb
    chunks, ids = [], []
    for k in range(replicas):
        X = np.roll(base, k % d, axis=1)
        signs = np.array(
            [1.0 if (k // d) >> (i % 16) & 1 == 0 else -1.0 for i in range(d)],
            dtype=np.float32,
        )
        chunks.append(X * signs)
        ids.append(np.arange(nb, dtype=np.int64) + k * nb + 1)
    V = np.concatenate(chunks)[:n]
    I = np.concatenate(ids)[:n]
    tbl = pa.table(
        {
            "vec_id": pa.array(I),
            "embedding": pa.array(list(V), type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, out, row_group_size=65536)
    return out


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def min_of(fn, n=5):
    runs = [timed(fn) for _ in range(n)]
    return min(runs), runs


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 1_000_000]

    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A
    from unified_log_aggregation_and_analytics_spark.session import get_spark
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    spark = get_spark("index100x")
    import duckdb

    qvec = [
        float(x)
        for x in duckdb.sql(
            f"SELECT embedding FROM '{SRC}/embeddings.parquet' WHERE vec_id = 0"
        ).fetchone()[0]
    ]
    rows_out = []
    knob_rows = []

    for n in sizes:
        data = make_vectors(n)
        emb = spark.read.parquet(data)
        delta = emb.filter(F.col("vec_id") <= 2000)  # one trigger's worth

        # --- IVF knob sweep at the first size only ---
        if n == sizes[0]:
            for nc in (16, 64, 256):
                path = os.path.join(WORK, f"ivf{nc}_{n}")
                shutil.rmtree(path, ignore_errors=True)
                b = timed(lambda: A.build_ivf_index(emb, path, n_centroids=nc))
                probe = lambda: A.ivf_probe(
                    spark, path, qvec, k=10, n_probe=4
                ).collect()
                cold = timed(probe)
                warm, _ = min_of(probe)
                knob_rows.append(
                    {"n_centroids": nc, "build_s": b, "cold_s": cold, "warm_s": warm}
                )
                print(json.dumps({"family": "ivf_knob", "n": n, **knob_rows[-1]}))

        for family, nc in (("ivf", 64), ("sq8", None), ("ivfsq8", 64)):
            path = os.path.join(WORK, f"{family}_{n}")
            shutil.rmtree(path, ignore_errors=True)
            if family == "ivf":
                b = timed(lambda: A.build_ivf_index(emb, path, n_centroids=nc))
                probe = lambda: A.ivf_probe(spark, path, qvec, k=10, n_probe=4).collect()
            elif family == "sq8":
                b = timed(lambda: A.build_sq8_index(emb, path))
                probe = lambda: A.sq8_probe(spark, path, qvec, k=10).collect()
            else:
                b = timed(lambda: A.build_ivfsq8_index(emb, path, n_centroids=nc))
                probe = lambda: A.ivfsq8_probe(
                    spark, path, qvec, k=10, n_probe=4
                ).collect()
            cold = timed(probe)
            warm, _ = min_of(probe)
            row = {
                "family": family,
                "n": n,
                "build_s": b,
                "probe_cold_s": cold,
                "probe_warm_s": warm,
            }
            # Maintenance cadence: one fenced delta + merge, IVF only
            # (the SQ8 tier has no fenced append path — its unfenced
            # appends are write-only and covered by test timings).
            if family == "ivf":
                ap = timed(
                    lambda: A.append_ivf_index_fenced(delta, path, batch_id=0)
                )
                fence.mark_committed(spark, fence.fence_root(path), 0)
                pre_merge, _ = min_of(probe, 3)
                mg = timed(lambda: A.merge_index_delta(spark, path))
                post_merge, _ = min_of(probe, 3)
                row.update(
                    {
                        "append_s": ap,
                        "probe_with_delta_s": pre_merge,
                        "merge_s": mg,
                        "probe_post_merge_s": post_merge,
                    }
                )
            print(json.dumps(row))
            rows_out.append(row)

    print(json.dumps({"summary": rows_out, "knob": knob_rows}))


if __name__ == "__main__":
    main()
