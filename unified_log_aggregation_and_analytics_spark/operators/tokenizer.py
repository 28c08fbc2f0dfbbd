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


# --- BPE training (the tokenizer-TRAINING stage of the pipeline) -----


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE corpus pass reducing the text to the vocabulary-sized
    ``(word, n)`` table BPE training actually needs (Sennrich et al.
    2016: merge statistics are a pure function of word frequencies,
    so the corpus is never re-read during training). Explode +
    map-side-combining hash agg; output cardinality is |vocab|."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(word_freqs, n_merges: int = 50) -> list[tuple[str, str]]:
    """Train BPE merges from a word-frequency table (DataFrame with
    ``word``/``n`` columns, or an iterable of (word, count)).

    This is the bounded-model-state pattern the IVF centroids use:
    the DISTRIBUTED work is the one-pass word_frequencies aggregation;
    training then iterates driver-side over the vocabulary-sized
    table (|vocab| rows — thousands, not corpus-scale), because each
    merge step needs global argmax over pair counts, an inherently
    sequential O(n_merges) loop no engine parallelizes usefully.

    Deterministic: ties on pair count break lexicographically, so the
    merge list is a pure function of the frequency table — identical
    across engines, retries, and partitionings. Symbols start as
    characters (no end-of-word marker; words never merge across
    whitespace by construction)."""
    from collections import Counter

    if isinstance(word_freqs, DataFrame):
        rows = word_freqs.collect()
        vocab = {tuple(r["word"]): int(r["n"]) for r in rows}
    else:
        vocab = {tuple(w): int(n) for w, n in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = "".join(best)
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


class BPETokenizer:
    """Greedy rank-order BPE encoder over trained merges, implementing
    the ``encode_batch`` interface — a drop-in backend for
    ArrowTokenizer / with_subword_tokens, so trained-BPE token counts
    flow through the exact plumbing the regex fallback and the
    HuggingFace backend use (Arrow-batched, never per-row Python)."""

    class _Enc:
        __slots__ = ("tokens",)

        def __init__(self, tokens: list[str]) -> None:
            self.tokens = tokens

    def __init__(self, merges: list[tuple[str, str]]) -> None:
        self._ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _encode_word(self, word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = self._ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def encode_batch(self, texts: list[str]) -> list["BPETokenizer._Enc"]:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in re.split(r"\s+", t.lower()):
                if w:
                    toks.extend(self._encode_word(w))
            out.append(BPETokenizer._Enc(toks))
        return out
