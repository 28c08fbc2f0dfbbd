"""Pluggable subword tokenization (X4): the token-counting and
chunking operators accept any tokenizer backend, with two tiers —

- **Regex fallback (default, JVM-side)**: the BPE-ish pre-tokenizer
  regex (letter runs / single digits / isolated marks) evaluated as
  ``regexp_extract_all`` inside whole-stage codegen. Deterministic,
  engine-portable (the DuckDB oracles mirror it), zero Python cost.
- **Real vocab-merge tokenizer (gated)**: any object implementing the
  HuggingFace ``tokenizers`` interface (``encode_batch(list[str]) ->
  encodings with .tokens``) runs Arrow-batched through a pandas UDF —
  never per-row Python. The wrapper targets the INTERFACE, not the
  library, so tests inject a deterministic fake and the real library
  is a drop-in when present (``load_tokenizer(path)``).

Why it matters: token-budget packing and per-document token counts
(operators/sampling.py pack_contiguous, text.py token_stats) are only
as faithful as the tokenizer; production corpora count with the
model's actual BPE vocab. The fallback keeps every oracle-checked
value identical when the library is absent — swapping backends changes
fidelity, never plumbing.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# BPE-ish pre-tokenizer: letter runs, single digits, or single
# non-alphanumeric marks (GPT-style byte-pair pre-split shape).
# Canonical definition lives here; operators/text.py re-exports it.
BPEISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

try:  # gated-real: HuggingFace tokenizers (Rust BPE/WordPiece/Unigram)
    from tokenizers import Tokenizer as _HFTokenizer

    _HAS_TOKENIZERS = True
except ImportError:  # pragma: no cover - environment-dependent
    _HFTokenizer = None
    _HAS_TOKENIZERS = False


class RegexSubwordTokenizer:
    """Deterministic fallback backend. ``tokens_column`` is the scale
    path (JVM, codegen); ``encode_batch`` provides the same splits
    Python-side so both backends satisfy one interface and parity is
    testable."""

    class _Enc:
        __slots__ = ("tokens",)

        def __init__(self, tokens: list[str]) -> None:
            self.tokens = tokens

    def tokens_column(self, text_col: Column | str) -> Column:
        c = F.col(text_col) if isinstance(text_col, str) else text_col
        return F.regexp_extract_all(c, F.lit(BPEISH_RE), 0)

    def encode_batch(self, texts: list[str]) -> list["RegexSubwordTokenizer._Enc"]:
        pat = re.compile(BPEISH_RE)
        return [self._Enc(pat.findall(t or "")) for t in texts]


class ArrowTokenizer:
    """Arrow-batched wrapper for a real tokenizer: anything with
    ``encode_batch`` (HF ``tokenizers.Tokenizer``, a SentencePiece
    adapter, or a test fake). ``tokens_column`` runs one pandas UDF —
    vectorized transfer, batch encode, no per-row Python."""

    def __init__(self, backend) -> None:
        if not hasattr(backend, "encode_batch"):
            raise TypeError("tokenizer backend must expose encode_batch(list[str])")
        self._backend = backend

    def tokens_column(self, text_col: Column | str) -> Column:
        backend = self._backend

        @pandas_udf(T.ArrayType(T.StringType()))
        def _tok(s: pd.Series) -> pd.Series:
            encs = backend.encode_batch(s.fillna("").tolist())
            return pd.Series([list(e.tokens) for e in encs])

        c = F.col(text_col) if isinstance(text_col, str) else text_col
        return _tok(c)


def load_tokenizer(path: str | None = None):
    """Backend factory: no path -> the deterministic regex fallback;
    a ``tokenizer.json`` path -> the real HuggingFace tokenizer,
    Arrow-wrapped — or a loud NotImplementedError when the library is
    not installed (never a silent downgrade: a caller who asked for a
    specific vocab must not get different token counts)."""
    if path is None:
        return RegexSubwordTokenizer()
    if not _HAS_TOKENIZERS:
        raise NotImplementedError(
            "tokenizers library not installed; pass path=None for the "
            "deterministic regex fallback"
        )
    return ArrowTokenizer(_HFTokenizer.from_file(path))  # pragma: no cover


def subword_tokens(text_col: Column | str, tokenizer=None) -> Column:
    """The pluggable tokens column: default regex fallback, or any
    backend exposing ``tokens_column``."""
    tok = tokenizer or RegexSubwordTokenizer()
    return tok.tokens_column(text_col)


def with_subword_tokens(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "_subword_tokens",
    tokenizer=None,
) -> DataFrame:
    """Materialize the subword array as a column — the composition
    point for downstream operators (chunk dedup on subword
    granularity, token-budget packing on real counts)."""
    return df.withColumn(out_col, subword_tokens(text_col, tokenizer))
