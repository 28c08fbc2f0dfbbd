"""Pluggable subword tokenizer (operators/tokenizer.py): the regex
fallback must leave every oracle-checked value untouched, the Arrow
wrapper must run any encode_batch backend through the same operators,
and asking for a real vocab without the library must fail loud.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators import tokenizer as TK
from unified_log_aggregation_and_analytics_spark.operators.dedup import chunk_dedup
from unified_log_aggregation_and_analytics_spark.operators.text import token_stats
from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR).limit(100)


def test_regex_fallback_is_identity(spark, docs):
    """token_stats with the explicit fallback backend == token_stats
    default — the oracle-checked values are byte-identical, so the
    pluggable seam costs nothing when no real tokenizer is given."""
    base = token_stats(docs).orderBy("doc_id").collect()
    via_backend = (
        token_stats(docs, tokenizer=TK.RegexSubwordTokenizer())
        .orderBy("doc_id")
        .collect()
    )
    assert via_backend == base


def test_regex_backend_python_jvm_parity(spark, docs):
    """The fallback's Python-side encode_batch produces the same
    splits as its JVM column — one interface, two engines, equal."""
    rows = docs.select("doc_id", "text").orderBy("doc_id").limit(20).collect()
    jvm = (
        docs.select("doc_id", TK.subword_tokens("text").alias("t"))
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )
    py = TK.RegexSubwordTokenizer().encode_batch([r["text"] for r in rows])
    assert [list(r["t"]) for r in jvm] == [e.tokens for e in py]


def _whitespace_fake():
    """Deterministic stand-in implementing the HuggingFace
    encode_batch interface — proves the Arrow plumbing without the
    library. Splits on whitespace so results are comparable to the
    operators' native whitespace granularity. Defined in function
    scope so cloudpickle serializes the class by value (the test
    module is not importable on Spark workers)."""

    class _Enc:
        def __init__(self, tokens):
            self.tokens = tokens

    class _WhitespaceFake:
        def encode_batch(self, texts):
            return [_Enc(t.split()) for t in texts]

    return _WhitespaceFake()


def test_arrow_backend_through_token_stats(spark, docs):
    """A real-interface backend flows through token_stats via one
    pandas UDF: n_subwords becomes the backend's count (here:
    whitespace tokens), other columns untouched."""
    got = (
        token_stats(docs, tokenizer=TK.ArrowTokenizer(_whitespace_fake()))
        .select("doc_id", "n_tokens", "n_subwords")
        .collect()
    )
    for r in got:
        assert r["n_subwords"] == r["n_tokens"]


def test_arrow_backend_through_chunk_dedup(spark, docs):
    """chunk_dedup on a pluggable tokens column (the fake = whitespace)
    equals chunk_dedup's native whitespace path — subword chunking is
    a column swap, not a new operator."""
    via_plug = chunk_dedup(
        TK.with_subword_tokens(docs, tokenizer=TK.ArrowTokenizer(_whitespace_fake())),
        tokens_col=F.col("_subword_tokens"),
    )
    native = chunk_dedup(docs)
    assert sorted(map(tuple, via_plug.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_missing_library_fails_loud():
    if TK._HAS_TOKENIZERS:  # pragma: no cover - environment-dependent
        pytest.skip("tokenizers installed; loud-failure branch not reachable")
    with pytest.raises(NotImplementedError, match="tokenizers"):
        TK.load_tokenizer("/nonexistent/tokenizer.json")
    assert isinstance(TK.load_tokenizer(None), TK.RegexSubwordTokenizer)
    with pytest.raises(TypeError, match="encode_batch"):
        TK.ArrowTokenizer(object())


@pytest.mark.skipif(not TK._HAS_TOKENIZERS, reason="tokenizers not installed")
def test_real_hf_tokenizer_path(spark, docs, tmp_path):  # pragma: no cover
    """Gated real path: a trained-from-scratch whitespace-level BPE
    runs Arrow-batched through token_stats."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    texts = [r["text"] for r in docs.select("text").collect()]
    tok.train_from_iterator(texts, BpeTrainer(special_tokens=["[UNK]"]))
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)
    got = token_stats(docs, tokenizer=TK.load_tokenizer(path)).collect()
    assert all(r["n_subwords"] > 0 for r in got if r["n_tokens"] > 0)
