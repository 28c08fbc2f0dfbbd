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


def test_train_bpe_hand_computed_merges():
    """ab x5 + abc x3: pair (a,b) count 8 wins round 1; (ab,c) count 3
    wins round 2 — the classic Sennrich walk, hand-verified."""
    from unified_log_aggregation_and_analytics_spark.operators.tokenizer import (
        BPETokenizer,
        train_bpe,
    )

    merges = train_bpe([("ab", 5), ("abc", 3)], n_merges=5)
    assert merges == [("a", "b"), ("ab", "c")]  # exhausts at 2
    enc = BPETokenizer(merges).encode_batch(["abcab zq"])[0]
    assert enc.tokens == ["abc", "ab", "z", "q"]


def test_train_bpe_corpus_roundtrip_and_compression(spark):
    """Trained-BPE tokens concatenate back to their words, and more
    merges never increase the token count."""
    from unified_log_aggregation_and_analytics_spark.operators import tokenizer as TK
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(50)
    wf = TK.word_frequencies(docs)
    m5 = TK.train_bpe(wf, n_merges=5)
    m30 = TK.train_bpe(wf, n_merges=30)
    assert m30[:5] == m5  # prefix-stable: training is deterministic
    bpe = TK.BPETokenizer(m30)
    for r in docs.select("text").collect()[:10]:
        toks = bpe.encode_batch([r.text])[0].tokens
        import re as _re
        assert "".join(toks) == "".join(_re.split(r"\s+", r.text.lower()))
    n5 = sum(len(TK.BPETokenizer(m5).encode_batch([r.text])[0].tokens)
             for r in docs.select("text").collect()[:10])
    n30 = sum(len(bpe.encode_batch([r.text])[0].tokens)
              for r in docs.select("text").collect()[:10])
    assert n30 <= n5


def test_bpe_plugs_into_subword_seam(spark):
    """The trained encoder flows through with_subword_tokens exactly
    like the other backends (Arrow-batched pandas UDF)."""
    from unified_log_aggregation_and_analytics_spark.operators import tokenizer as TK

    df = spark.createDataFrame([(1, "ab ab abc")], ["doc_id", "text"])
    merges = TK.train_bpe([("ab", 5), ("abc", 3)], n_merges=2)
    out = TK.with_subword_tokens(df, tokenizer=TK.ArrowTokenizer(TK.BPETokenizer(merges)))
    assert out.collect()[0]["_subword_tokens"] == ["ab", "ab", "abc"]
