"""Vector math over ``array<float>`` columns, JVM-side.

Used by the similarity-search operators (X3). No Python UDFs anywhere.
Two expression families:

- ``aggregate``/``zip_with`` higher-order functions for unknown-dim
  columns. CAVEAT: HOF lambda bodies are CodegenFallback — Spark
  evaluates them interpreted with per-element boxing, so on a
  pair-scoring hot path (candidate join degree x dim element ops)
  they dominate runtime.
- ``*_unrolled`` variants for a KNOWN dim: the loop is unrolled into
  a flat GetArrayItem product-sum expression. Use these ONLY when one
  side is a literal vector (query-vector paths): the per-element
  literals constant-fold and the expression stays cheap. On a
  column-column pair stream the 64-term flat expression splits across
  generated methods and runs ~4x SLOWER than the single HOF fold
  (measured 2.57s vs 0.66s over a 1.26M-pair sf0.1 kNN-graph join) —
  keep the HOF form there. Term order is the same left-assoc fold in
  both, so they produce bit-identical doubles — oracle twins hold
  across either variant.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Codegen-path dot product for a known ``dim``: flat sum of
    element products (left-assoc — bit-identical to ``dot``)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return reduce(
        operator.add,
        [a[i].cast("double") * b[i].cast("double") for i in range(dim)],
    )


def l2_norm_unrolled(a: Column | str, dim: int) -> Column:
    """Codegen-path Euclidean norm for a known ``dim``."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        reduce(
            operator.add,
            [a[i].cast("double") * a[i].cast("double") for i in range(dim)],
        )
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _elems_sql(v: object, dim: int) -> list[str] | None:
    """Per-element SQL fragments for the one-parse expression builder:
    a str is a column name / SQL array expression (indexed per
    element), a list/tuple is a literal vector (each element inlines
    as a double literal — ``repr`` round-trips IEEE doubles exactly
    and the ``D`` suffix parses via Double.parseDouble, so the folded
    constants are bit-identical to ``F.lit(float(x))``). Returns None
    for Column objects (the per-element py4j path)."""
    if isinstance(v, str):
        return [f"CAST(({v})[{i}] AS DOUBLE)" for i in range(dim)]
    if isinstance(v, (list, tuple)):
        if len(v) < dim:
            raise ValueError(f"literal vector has {len(v)} elems < dim {dim}")
        return [f"{float(x)!r}D" for x in v[:dim]]
    return None


def cosine_similarity(
    a: Column | str | list, b: Column | str | list, dim: int | None = None
) -> Column:
    """Cosine similarity of two array<numeric> columns. Pass ``dim``
    whenever it is known (query vectors carry it for free) to get the
    whole-stage-codegen unrolled form instead of the interpreted HOF
    fold — same values, ~10x cheaper per row.

    Construction cost: a str (column name or SQL array expression)
    or list (literal query vector) operand builds the whole unrolled
    expression through ONE ``F.expr`` parse; Column operands fall
    back to per-element Column arithmetic (~1000 py4j round-trips at
    dim 64 — ~2.5 s of driver latency per call, measured r13). Probe
    paths that construct per query must pass str/list. The parsed
    tree is the same left-assoc product-sum as the Column form, so
    both produce bit-identical doubles."""
    if dim is not None:
        ea, eb = _elems_sql(a, dim), _elems_sql(b, dim)
        if ea is not None and eb is not None:
            dot_s = " + ".join(f"{x} * {y}" for x, y in zip(ea, eb))
            na = " + ".join(f"{x} * {x}" for x in ea)
            nb = " + ".join(f"{y} * {y}" for y in eb)
            return F.expr(f"({dot_s}) / (SQRT({na}) * SQRT({nb}))")
        return dot_unrolled(a, b, dim) / (
            l2_norm_unrolled(a, dim) * l2_norm_unrolled(b, dim)
        )
    if isinstance(a, list):
        a = F.array(*[F.lit(float(x)) for x in a])
    if isinstance(b, list):
        b = F.array(*[F.lit(float(x)) for x in b])
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
