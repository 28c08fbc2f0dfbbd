"""Product quantization (X3 scale path): compress ``array<float>``
embeddings to a few CODE BYTES per vector and answer kNN with
asymmetric-distance (ADC) lookups — the standard memory story for
warehouse-scale vector search (Jégou et al., TPAMI'11; the PQ half of
FAISS's IVF-PQ), where a 100 TB float corpus becomes ~3 TB of codes
that scan at memory bandwidth.

How it maps to Spark:

- A codebook is (m subspaces × 2^b codes × dim/m floats) — a few KB,
  always driver-side, embedded into plans as literals (like the LSH
  hyperplanes).
- ENCODING is per-row: nearest codeword per subspace. Two paths with
  identical outputs (parity-tested):
  * ``pq_code_expr`` — pure JVM expressions (argmin over per-code
    distance folds). Deterministic and replayable in DuckDB — the
    certification path.
  * ``pq_encode`` — Arrow ``mapInPandas``, one (batch × sub_dim) @
    (sub_dim × codes) GEMM per subspace — the throughput path.
- ADC SEARCH is map-only: the query builds an (m × codes) lookup
  table driver-side; each row's distance is m array lookups summed —
  whole-stage-codegen, no Python, TakeOrderedAndProject top-k.
- TRAINING is Lloyd iterations run as Spark jobs (assignment via the
  GEMM path, means via one hash agg); only the (m × codes × sub_dim)
  means ever reach the driver, rounded for engine reproducibility —
  the same contract as similarity.kmeans_refine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seeded_pq_codebooks(
    dim: int, m: int = 4, codes: int = 8, seed: int = 42, scale: float = 0.15
) -> np.ndarray:
    """Deterministic (data-independent) codebooks — the untrained
    baseline and the certification anchor: a pure function of
    (dim, m, codes, seed), so a DuckDB oracle can embed the identical
    literals. ``scale`` roughly matches the fixture embeddings'
    component spread; training replaces these for quality."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, codes, dim // m)) * scale


def _sub_slice(vec: Column, mi: int, sub_dim: int) -> Column:
    return F.slice(vec, mi * sub_dim + 1, sub_dim)


def _l2_to_code(sub: Column, codeword: np.ndarray) -> Column:
    """Squared L2 distance of a subvector column to one codeword
    literal — left-assoc HOF fold, the same term order as the DuckDB
    replay."""
    cw = F.array(*[F.lit(float(x)) for x in codeword])
    return F.aggregate(
        F.zip_with(sub, cw, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_code_expr(vec_col: Column | str, codebooks: np.ndarray) -> Column:
    """JVM-expression PQ encoding: array of per-subspace nearest-code
    indices (first-min tie rule, matching DuckDB ``list_position``).
    The certification path — slow-ish per row but bit-reproducible
    across engines.

    Construction cost (r13): a str operand (column name or SQL array
    expression) builds the whole tree through ONE ``F.expr`` parse;
    the per-element Column path costs ~1.3 s of driver py4j latency
    per call at m=4/codes=8 (the cosine_similarity finding). The
    parsed tree is the identical array_sort-of-struct-of-HOF-folds
    (same zip_with/aggregate lambdas, same double literals via exact
    ``repr`` round-trip), so codes are bit-identical — the encode
    parity test compares both against the Arrow path."""
    m, codes, sub_dim = codebooks.shape
    if isinstance(vec_col, str):
        subs = []
        for mi in range(m):
            sub = f"slice(({vec_col}), {mi * sub_dim + 1}, {sub_dim})"
            structs = []
            for ci in range(codes):
                cw = ", ".join(f"{float(x)!r}D" for x in codebooks[mi, ci])
                dist = (
                    f"aggregate(zip_with({sub}, array({cw}), "
                    "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                    "0.0D, (acc, x) -> acc + x)"
                )
                structs.append(f"named_struct('d', {dist}, 'c', {ci})")
            subs.append(f"array_sort(array({', '.join(structs)}))[0].c")
        return F.expr(f"array({', '.join(subs)})")
    c = vec_col
    out = []
    for mi in range(m):
        sub = _sub_slice(c, mi, sub_dim)
        ranked = F.array_sort(
            F.array(
                *[
                    F.struct(
                        _l2_to_code(sub, codebooks[mi, ci]).alias("d"),
                        F.lit(ci).alias("c"),
                    )
                    for ci in range(codes)
                ]
            )
        )
        out.append(ranked[0]["c"])
    return F.array(*out)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Throughput-path PQ encoding: ``(id, *passthrough, pq_codes
    array<int>, pq_code binary)`` — the binary column is the storage
    format (m bytes/vector; requires codes <= 256). One Arrow batch
    in, m GEMMs, codes out; no shuffle (fused into the scan).
    ``passthrough`` columns (e.g. an IVF cell) are carried as-is so a
    composed index needs no re-join."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        IntegerType,
        StructField,
        StructType,
    )

    m, codes, sub_dim = codebooks.shape
    if codes > 256:
        raise ValueError("binary packing requires codes <= 256")
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + [StructField(c, df.schema[c].dataType) for c in passthrough]
        + [
            StructField("pq_codes", ArrayType(IntegerType())),
            StructField("pq_code", BinaryType()),
        ]
    )
    cb = codebooks.astype(np.float64)
    sq = (cb**2).sum(axis=2)  # (m, codes)

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = len(pdf)
            codes_out = np.empty((n, m), dtype=np.int64)
            for mi in range(m):
                sub = X[:, mi * sub_dim : (mi + 1) * sub_dim]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is
                # constant per row, dropped from the argmin
                d = sq[mi][None, :] - 2.0 * (sub @ cb[mi].T)
                codes_out[:, mi] = d.argmin(axis=1)
            out = {id_col: pdf[id_col].to_numpy()}
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            out["pq_codes"] = [list(map(int, r)) for r in codes_out]
            out["pq_code"] = [bytes(r.astype(np.uint8)) for r in codes_out]
            yield pd.DataFrame(out)

    return df.select(id_col, *passthrough, vec_col).mapInPandas(enc, out_schema)


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """ADC top-k over PQ codes: the query's per-subspace distance
    table (m × codes doubles) is computed driver-side and embedded as
    literals; each row's approximate squared distance is m array
    lookups + a sum — map-only whole-stage codegen over the code
    table, TakeOrderedAndProject top-k. The float corpus is never
    read."""
    m, codes, sub_dim = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * sub_dim:
        raise ValueError("query dim mismatch")
    terms = []
    for mi in range(m):
        sub = q[mi * sub_dim : (mi + 1) * sub_dim]
        # left-assoc fold per code, matching the oracle's list_sum
        lut = []
        for ci in range(codes):
            acc = 0.0
            for a, b in zip(sub, codebooks[mi, ci]):
                acc += (float(a) - float(b)) * (float(a) - float(b))
            lut.append(acc)
        lut_col = F.array(*[F.lit(x) for x in lut])
        terms.append(F.element_at(lut_col, F.col(codes_col)[mi] + 1))
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return (
        codes_df.select(
            F.col(id_col), F.round(dist, 6).alias("adc_dist")
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def l2_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact squared-L2 top-k against one query literal — the ground
    truth ADC approximates. Scan + fold + TakeOrderedAndProject;
    rounded with id tie-break like every retrieval kernel here."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    c = F.col(vec_col)
    dist = F.aggregate(
        F.zip_with(c, q, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df.select(F.col(id_col), F.round(dist, 6).alias("l2_dist"))
        .orderBy(F.col("l2_dist").asc(), F.col(id_col))
        .limit(k)
    )


def train_pq_codebooks(
    df: DataFrame,
    dim: int,
    m: int = 4,
    codes: int = 8,
    n_iter: int = 2,
    seed: int = 42,
    vec_col: str = "embedding",
    round_means: int = 6,
) -> np.ndarray:
    """Lloyd-trained codebooks: start from the seeded baseline, then
    ``n_iter`` rounds of (GEMM assignment → per-(subspace, code) mean
    via ONE hash aggregation over the exploded subvector stream).
    Only the (m × codes × sub_dim) means cross to the driver, rounded
    to ``round_means`` decimals so retraining is engine-reproducible
    (same contract as similarity.kmeans_refine). Empty cells keep
    their previous codeword."""
    sub_dim = dim // m
    cb = seeded_pq_codebooks(dim, m, codes, seed)
    for _ in range(n_iter):
        enc = pq_encode(df, cb, vec_col=vec_col, id_col=_first_id(df, vec_col))
        joined = df.join(enc, _first_id(df, vec_col))
        rows = []
        for mi in range(m):
            sub = _sub_slice(F.col(vec_col), mi, sub_dim)
            rows.append(
                joined.select(
                    F.lit(mi).alias("mi"),
                    F.col("pq_codes")[mi].alias("code"),
                    *[
                        sub[j].cast("double").alias(f"x{j}")
                        for j in range(sub_dim)
                    ],
                )
            )
        allsub = rows[0]
        for r in rows[1:]:
            allsub = allsub.unionByName(r)
        means = (
            allsub.groupBy("mi", "code")
            .agg(*[F.round(F.avg(f"x{j}"), round_means).alias(f"x{j}") for j in range(sub_dim)])
            .collect()
        )
        nxt = cb.copy()
        for r in means:
            nxt[r["mi"], r["code"]] = [r[f"x{j}"] for j in range(sub_dim)]
        cb = nxt
    return cb


def _first_id(df: DataFrame, vec_col: str) -> str:
    for f in df.schema.fields:
        if f.name != vec_col:
            return f.name
    raise ValueError("no id column found")


def pq_reconstruction_error(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantization-quality certificate: mean / max squared L2
    reconstruction error of the PQ codes over the corpus — one
    aggregation, JVM-side (the per-row error reuses the encode
    expression's distance folds)."""
    m, codes, sub_dim = codebooks.shape
    c = F.col(vec_col)
    code_arr = pq_code_expr(c, codebooks)
    err_terms = []
    for mi in range(m):
        sub = _sub_slice(c, mi, sub_dim)
        ranked = F.array_sort(
            F.array(
                *[
                    F.struct(
                        _l2_to_code(sub, codebooks[mi, ci]).alias("d"),
                        F.lit(ci).alias("c"),
                    )
                    for ci in range(codes)
                ]
            )
        )
        err_terms.append(ranked[0]["d"])
    err = err_terms[0]
    for t in err_terms[1:]:
        err = err + t
    scored = df.select(F.col(id_col), err.alias("sq_err"), code_arr.alias("pq_codes"))
    return scored.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("sq_err"), 6).alias("mean_sq_err"),
        F.round(F.max("sq_err"), 6).alias("max_sq_err"),
    )


def opq_interleave_perm(dim: int, m: int) -> list[int]:
    """OPQ eigenvalue allocation, balanced round-robin variant (the
    parametric OPQ of Ge et al., CVPR'13: rotate so per-subspace
    variance products balance, then product-quantize). Power-iteration
    PCA emits components variance-DESCENDING, so dealing them
    round-robin into the m subspaces gives every subspace one slice
    of each variance tier — the balance OPQ's eigenvalue allocation
    seeks, as a FIXED permutation (no data-dependent assignment to
    replay): rotated coordinate ``i`` (subspace ``i // sub_dim``)
    takes PCA component ``perm[i]``. Compose by row-permuting the
    rotation matrix: ``R_opq = R[perm]``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    return [(i // sub_dim) + m * (i % sub_dim) for i in range(dim)]
