"""Scale-stress data generator: replicate the driver's sf0.1
documents/embeddings tables R times (default 10 -> "sf1") with
structure-preserving perturbations, so bench.py's scale section can
show how the dedup/ANN families behave at 10x rows.

Why not plain replication: exact copies would turn every document
into an R-way duplicate group and every vector into an R-way
collision — candidate-pair counts would grow quadratically BY
CONSTRUCTION, which measures the synthetic data, not the engine.
Instead each replica is made distinct while keeping the per-replica
workload statistics of the original:

- documents: every token longer than 3 chars gets a per-replica
  suffix (a bijection on the content-token space). Duplicate/near-dup
  structure WITHIN a replica is exactly sf0.1's; shingle spaces
  ACROSS replicas are disjoint except for short-token (stopword-ish)
  shingles — which mirrors real corpora, where boilerplate shingles
  recur corpus-wide. Stopword/length/repetition statistics survive,
  so quality filters route replicas like the original.
- embeddings: replica k rotates each vector's components by k
  positions — norm-preserving, deterministic, and far from the
  original in cosine, so ANN bucket populations grow ~linearly
  instead of stacking R copies in every bucket.
- TPC-H tables (customer/orders/lineitem/supplier/part): replica k
  offsets every key column by k * (max_key + 1) CONSISTENTLY across
  tables, so referential joins stay intact and fact/dim populations
  grow together — the same thing raising the TPC-H scale factor
  does. nation/region are constant-size dims, copied as-is.

Replica 0 is byte-identical to the source, so sf0.1 results embed in
the scaled corpus. Pure DuckDB; runs in seconds at this size.
"""

from __future__ import annotations

import os

import duckdb

DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_REPLICAS = 10

_SALT_TEXT = """
array_to_string(
  list_transform(
    regexp_split_to_array(text, '\\s+'),
    t -> CASE WHEN length(t) <= 3 THEN t ELSE t || 'q{k}' END),
  ' ')
"""


def generate(
    dst: str,
    src: str = DEFAULT_SRC,
    replicas: int = DEFAULT_REPLICAS,
) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    n_docs = con.sql(f"SELECT MAX(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
    parts = []
    for k in range(replicas):
        text_expr = "text" if k == 0 else _SALT_TEXT.format(k=k)
        parts.append(
            f"""SELECT doc_id + {k * n_docs} AS doc_id,
                       {text_expr} AS text,
                       lang, source,
                       length({text_expr}) AS n_chars
                FROM '{src}/documents.parquet'"""
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )

    n_vecs = con.sql(f"SELECT MAX(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    dim = con.sql(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    parts = []
    for k in range(replicas):
        vec_expr = (
            "embedding"
            if k == 0
            else f"list_concat(embedding[{k + 1}:{dim}], embedding[1:{k}])"
        )
        parts.append(
            f"""SELECT vec_id + {k * n_vecs} AS vec_id,
                       CAST({vec_expr} AS FLOAT[]) AS embedding,
                       label
                FROM '{src}/embeddings.parquet'"""
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"
    )

    strides = {
        key: con.sql(
            f"SELECT MAX({key}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        for key, table in [
            ("o_orderkey", "orders"),
            ("c_custkey", "customer"),
            ("p_partkey", "part"),
            ("s_suppkey", "supplier"),
        ]
    }
    key_of = {
        "customer": {"c_custkey": "c_custkey"},
        "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        "lineitem": {
            "l_orderkey": "o_orderkey",
            "l_partkey": "p_partkey",
            "l_suppkey": "s_suppkey",
        },
        "part": {"p_partkey": "p_partkey"},
        "supplier": {"s_suppkey": "s_suppkey"},
    }
    for table, keymap in key_of.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        parts = []
        for k in range(replicas):
            sel = ", ".join(
                f"{c} + {k * strides[keymap[c]]} AS {c}" if c in keymap else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}/{table}.parquet'")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in ("nation", "region"):
        con.sql(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    # events (r13): replicate with event_id/user_id offsets — replicas
    # carry new ids (fresh users, fresh events) so per-user windows and
    # the geo-enrichment ip formula see honest 10x growth, while ts and
    # value distributions stay the driver's.
    n_ev = con.sql(
        f"SELECT MAX(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    n_usr = con.sql(
        f"SELECT MAX(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/events.parquet'"
        ).fetchall()
    ]
    parts = []
    for k in range(replicas):
        sel = ", ".join(
            f"event_id + {k * n_ev} AS event_id"
            if c == "event_id"
            else f"user_id + {k * n_usr} AS user_id"
            if c == "user_id"
            else c
            for c in cols
        )
        parts.append(f"SELECT {sel} FROM '{src}/events.parquet'")
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()


if __name__ == "__main__":
    import sys

    dst = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf1"
    generate(dst)
    print(f"wrote {dst}")
