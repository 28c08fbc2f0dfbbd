"""Text-analysis operators (X4): language ID, quality scoring, token
counting, fingerprinting — the LLM-training-pipeline text family.

All per-document computation is higher-order column expressions over
the tokenized text: map-only, JVM-side, linear in corpus size. No
model inference here — the language identifier is a stopword-profile
heuristic (deterministic, oracle-checkable); plug a real classifier in
via mapInPandas when available.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators.dedup import tokens

# Stopword profiles for the language-ID heuristic. Order matters: ties
# resolve to the earlier language.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


# BPE-ish pre-tokenizer regex — canonical definition + pluggable real
# backends live in operators/tokenizer.py; re-exported here for
# compatibility.
from unified_log_aggregation_and_analytics_spark.operators.tokenizer import (  # noqa: E402
    BPEISH_RE,
    subword_tokens,
)


def token_stats(df: DataFrame, text_col: str = "text", tokenizer=None) -> DataFrame:
    """X4 — token counting: whitespace tokens (total + distinct), a
    subword count, and the chars/4 rule-of-thumb estimate.

    ``tokenizer`` plugs the subword backend (operators/tokenizer.py):
    None -> the deterministic JVM-side BPE-ish regex (the oracle-
    mirrored fallback, unchanged values); an ArrowTokenizer -> a real
    vocab-merge tokenizer batch-encoding through one pandas UDF."""
    toks = tokens(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("long"),
            "n_uniq_tokens": F.size(F.array_distinct(toks)).cast("long"),
            "n_subwords": F.size(subword_tokens(text_col, tokenizer)).cast("long"),
            "tok_est": F.ceil(F.length(text_col) / 4).cast("long"),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X4 — quality heuristics: stopword count, type-token ratio, mean
    token length. Exact integer counts + one IEEE division each —
    deterministic across engines."""
    toks = tokens(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return df.withColumns(
        {
            "n_tokens": n.cast("long"),
            "n_stopwords": n_stop.cast("long"),
            "ttr": F.size(F.array_distinct(toks)).cast("double") / n,
            "stop_ratio": n_stop.cast("double") / n,
            "mean_tok_len": (
                (F.length(text_col) - (n - 1)).cast("double") / n
            ),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X4 — stopword-profile language identification: score each
    language by distinct-stopword hits, predict the argmax (ties to
    the earlier language in LANG_STOPWORDS order)."""
    uniq = F.array_distinct(tokens(text_col))
    hits = {
        lang: F.size(
            F.array_intersect(uniq, F.array(*[F.lit(s) for s in words]))
        ).alias(f"hits_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    }
    out = df.withColumns({f"hits_{lang}": col for lang, col in hits.items()})
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_STOPWORDS])
    pred = None
    for lang in reversed(list(LANG_STOPWORDS)):
        cond = F.col(f"hits_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else F.when(cond, F.lit(lang)).otherwise(pred)
    # reversed() + overwrite order means the FIRST language in dict
    # order wins ties, matching the documented tie rule.
    return out.withColumn("pred_lang", pred)


# Character-trigram profiles for the n-gram language heuristic:
# high-frequency trigrams per language (with surrounding spaces where
# they are word-boundary markers).
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "ing", "and", " of"),
    "de": ("der", "sch", "ein", "ich", "und"),
    "fr": ("les", "ent", " de", "que", "ion"),
    "es": (" de", "los", "que", "ión", " la"),
}


def _occurrences(col: Column, needle: str) -> Column:
    """Count (possibly overlapping-adjacent) occurrences of ``needle``
    via the replace-length trick — the same expression ANSI SQL can
    state, keeping the op oracle-checkable."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_id_ngram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X4 — character-n-gram language ID: score each language by total
    occurrences of its high-frequency trigrams in the case-folded
    text; predict the argmax (ties to LANG_TRIGRAMS order). Pure
    string expressions — codegen, no tokenization pass."""
    low = F.lower(F.col(text_col))
    out = df.withColumns(
        {
            f"ng_{lang}": sum(
                (_occurrences(low, t) for t in tris), F.lit(0).cast("long")
            )
            for lang, tris in LANG_TRIGRAMS.items()
        }
    )
    best = F.greatest(*[F.col(f"ng_{lang}") for lang in LANG_TRIGRAMS])
    pred = None
    for lang in reversed(list(LANG_TRIGRAMS)):
        cond = F.col(f"ng_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang_ngram", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X4 — document fingerprints: exact md5 and a normalized variant
    (case-folded, whitespace-collapsed) for boilerplate detection."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumns(
        {
            "fp": F.md5(F.col(text_col).cast("binary")),
            "fp_norm": F.md5(norm.cast("binary")),
        }
    )


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """X4 — feature-hashed document vectors (the "hashing trick",
    Weinberger et al. ICML'09): every token OCCURRENCE adds ±1 to one
    of ``dim`` buckets — bucket from the token's first 8 md5 hex
    digits, sign from the 9th. Long form ``(id, bucket, val)`` with
    INTEGER values: exact, addition-order-free, engine-identical —
    text gets a similarity-searchable vector with no embedding model
    and no float discipline at all. One explode + one hash
    aggregation keyed on (id, bucket): at 100 TB the shuffle carries
    |docs| x dim partial sums, never token lists."""
    from unified_log_aggregation_and_analytics_spark.operators.dedup import tokens

    # Drop empty tokens explicitly: BOTH engines keep edge empties
    # from a \s+ split (Spark's F.split uses limit=-1, so leading AND
    # trailing empties survive; DuckDB str_split_regex likewise) —
    # filtering '' is the split-convention-free contract, and an
    # empty token is not a feature anyway.
    ex = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).filter(F.col("_t") != "")
    h = F.md5(F.col("_t").cast("binary"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(dim)
    sign = F.when(F.substring(h, 9, 1).isin(*"01234567"), F.lit(1)).otherwise(
        F.lit(-1)
    )
    return ex.groupBy(F.col(id_col), bucket.alias("bucket")).agg(
        F.sum(sign).alias("val")
    )


def _hash_embed_score(
    vecs: DataFrame,
    qvec: dict[int, int],
    k: int,
    id_col: str,
) -> DataFrame:
    """Score hashed long-form vectors against a COLLECTED query
    vector (dict bucket -> integer value, <= dim entries — bounded
    model state, the _query_vec convention): the query rides the plan
    as a literal map lookup, so scoring is ONE pass over ``vecs``
    with zero joins — no scalar crossJoin, no re-derivation of the
    corpus aggregation per consumer. Dots and norms stay exact
    integer sums; sqrt(qnrm) is an in-plan JVM sqrt of an exact
    integer-valued double literal (identical to the oracle's
    sqrt(CAST(qnrm AS DOUBLE)))."""
    qnrm = sum(v * v for v in qvec.values())
    if qnrm == 0:
        # a query of pure whitespace hashes to nothing: no similarity
        # is defined — empty result beats an engine-dependent x/0
        spark = vecs.sparkSession
        id_type = vecs.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], schema=f"{id_col} {id_type}, cos_sim double"
        )
    # qnrm > 0 implies qvec is non-empty — the map is safe to build
    qmap = F.create_map(*[F.lit(x) for kv in qvec.items() for x in kv])
    qval = F.coalesce(qmap[F.col("bucket")], F.lit(0))
    scored = (
        vecs.groupBy(id_col)
        .agg(
            F.sum(F.col("val") * F.col("val")).alias("nrm"),
            F.sum(F.col("val") * qval).alias("dot"),
        )
        .filter(F.col("nrm") > 0)
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("nrm").cast("double")) * F.sqrt(F.lit(float(qnrm)))
    )
    return (
        scored.select(F.col(id_col), F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hash_embed_retrieve(
    cand_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """X4 x X3 — generic hashed-vector retrieval: score CANDIDATE
    texts against a QUERY text from a different frame (the RAG shape:
    candidates are chunks, the query is a question/document).
    ``query_df`` must contain exactly one row; its feature-hashed
    vector (<= dim integers) collects driver-side and rides the
    candidate pass as a literal map — ONE scan of the candidates,
    zero joins. ``extra_cols`` ride the candidate id through the
    aggregation (e.g. (doc_id, chunk_idx) alongside a composite
    chunk id)."""
    vecs = hash_embed(cand_df, text_col=text_col, id_col=id_col, dim=dim)
    qrows = hash_embed(
        query_df, text_col=text_col, id_col=id_col, dim=dim
    ).collect()
    if not qrows and query_df.limit(1).count() == 0:
        # Distinguish "no query row at all" (caller bug — raise) from
        # "query present but hashes to nothing" (whitespace-only text
        # -> zero vector -> legitimately empty result below).
        raise ValueError(
            "hash_embed_retrieve got an empty query_df — expected "
            "exactly one query row"
        )
    n_query_ids = len({r[0] for r in qrows})
    if n_query_ids > 1:
        raise ValueError(
            "hash_embed_retrieve expects exactly one query row — got "
            f"{n_query_ids} distinct ids; merging them by bucket "
            "would score a nondeterministic chimera vector"
        )
    qvec = {int(r.bucket): int(r.val) for r in qrows}
    ranked = _hash_embed_score(vecs, qvec, k, id_col)
    if extra_cols:
        meta = cand_df.select(id_col, *extra_cols).dropDuplicates([id_col])
        ranked = (
            ranked.join(meta, id_col)
            .select(id_col, *extra_cols, "cos_sim")
            .orderBy(F.col("cos_sim").desc(), F.col(id_col))  # joins drop order
        )
    return ranked


def hash_embed_knn(
    df: DataFrame,
    query_id: int = 0,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """X4 x X3 — nearest documents by cosine over feature-hashed
    vectors: similarity search directly on text, no embedding model.
    The query document's hashed vector (<= dim integers) collects
    driver-side (the _query_vec bounded-model-state convention) and
    rides the corpus pass as a literal map lookup — ONE corpus scan,
    zero joins, no re-derivation of the hash aggregation per
    consumer. All sums are exact integers; the only float step is the
    final ``dot / (sqrt(nrm) * sqrt(qnrm))`` (two separately-rooted
    factors — ``sqrt(nrm * qnrm)`` could exceed 2^53 and lose integer
    exactness), round-6, id tie-break. Zero-norm documents (a text of
    pure whitespace hashes to nothing) are excluded on both engines
    rather than dividing by zero differently."""
    vecs = hash_embed(df, text_col=text_col, id_col=id_col, dim=dim)
    qvec = {
        int(r.bucket): int(r.val)
        for r in vecs.filter(F.col(id_col) == query_id).collect()
    }
    return _hash_embed_score(
        vecs.filter(F.col(id_col) != query_id), qvec, k, id_col
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", hash_fn: str = "xxhash64"
) -> DataFrame:
    """X4 — order-sensitive rolling hash over the token stream:
    ``h_i = hash(h_{i-1}, token_i)`` folded left-to-right. The
    chained-hash form is ANSI-overflow-safe (no multiply) while
    keeping the rolling property: any token edit changes the
    fingerprint, and prefix-equal documents share hash prefixes during
    the fold (useful for streaming/incremental fingerprinting).

    ``hash_fn='md5'`` chains the 16-hex md5 prefix of (acc || token)
    instead — bit-identical in DuckDB via ``list_reduce`` over the
    seed-prepended token list, making the ORDER-SENSITIVE fold itself
    oracle-checkable (the simhash64/minhash md5-twin convention);
    xxhash64 stays the fast engine-native default. The md5 chain's
    fp_roll is a 16-hex string; the xxhash64 chain's is a long."""
    if hash_fn == "xxhash64":
        roll = F.aggregate(
            tokens(text_col),
            F.lit(0).cast("long"),
            lambda acc, t: F.xxhash64(acc, t),
        )
    elif hash_fn == "md5":
        roll = F.aggregate(
            tokens(text_col),
            F.lit("0" * 16),
            lambda acc, t: F.substring(
                F.md5(F.concat(acc, t).cast("binary")), 1, 16
            ),
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    return df.withColumn("fp_roll", roll)


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 1
) -> DataFrame:
    """X4 — top-k terms per document by TF-IDF.

    Plan shape at scale: explode(tokens) → two hash aggregations
    (term frequency per doc, then document frequency per term) → one
    equi-join on ``term`` (the inverted-index shuffle key — term
    cardinality is vocabulary-sized, far below corpus size, and the
    partial aggregation combines map-side) → per-doc window top-k.
    The corpus size N enters as a 1-row broadcast cross join, never a
    driver-side collect loop.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy(id_col).orderBy(score.desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", F.round(score, 6).alias("tfidf"))
    )


# PII patterns shared by engine and oracle (Java regex and RE2 agree
# on this subset — no backrefs, no lookaround).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUM_RE = r"[0-9]{3,}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X4 — PII scrubbing: mask emails and long digit runs, report
    per-document redaction counts. Map-only column expressions; the
    scrubbed text is carried as an md5 certificate so equality checks
    stay cheap."""
    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
        PII_NUM_RE,
        "<NUM>",
    )
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_NUM_RE), 0)).alias("n_nums"),
        F.md5(clean.cast("binary")).alias("clean_hash"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X4 — Gopher-style repetition signals per document: duplicate
    word fraction, top-word fraction, and duplicate bigram fraction
    (the "repetitious document" family of quality filters from the
    Gopher/MassiveText rules, adapted to word granularity).

    Plan shape at scale: the bigram duplicate fraction is a pure array
    expression (``arrays_zip`` of two shifted slices — no lambda HOF,
    stays in codegen) computed in the pre-explode projection and
    carried through as per-doc constants; word multiplicities are
    explode → (doc, token) hash agg → (doc) hash agg, both map-side
    combined. Zero joins, one shuffle pair keyed on doc/token.
    """
    toks = tokens(text_col)
    nb = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.arrays_zip(F.slice(toks, 1, nb), F.slice(toks, 2, nb))
    # Barrier: materialize (nb, nb_uniq, toks) ONCE per doc behind a
    # Generate before the token explode — otherwise CollapseProject
    # in-lines the bigram array_distinct into the exploded projection
    # and re-evaluates it per TOKEN row, turning the linear pass into
    # O(tokens x doc_len) (measured 24.6 s -> 1.4 s at sf0.1).
    pre = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(
                    nb.alias("nb"),
                    F.size(F.array_distinct(bigrams)).alias("nb_uniq"),
                    toks.alias("toks"),
                )
            )
        ).alias("b"),
    )
    exploded = pre.select(
        F.col(id_col),
        F.col("b.nb").alias("nb"),
        F.col("b.nb_uniq").alias("nb_uniq"),
        F.explode("b.toks").alias("tok"),
    )
    wc = exploded.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("nb").alias("nb"),
        F.max("nb_uniq").alias("nb_uniq"),
    )
    per_doc = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.max("c").alias("top_cnt"),
        F.max("nb").alias("nb"),
        F.max("nb_uniq").alias("nb_uniq"),
    )
    n = F.col("n_tokens")
    return per_doc.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        ((n - F.col("n_uniq")).cast("double") / n).alias("dup_word_frac"),
        (F.col("top_cnt").cast("double") / n).alias("top_word_frac"),
        F.when(
            F.col("nb") > 0,
            (F.col("nb") - F.col("nb_uniq")).cast("double") / F.col("nb"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


# C4-style composite filter thresholds: a document is kept when it is
# long enough, lexically diverse, and not dominated by repetition.
QF_MIN_TOKENS = 30
QF_MAX_DUP_WORD_FRAC = 0.7
QF_MAX_TOP_WORD_FRAC = 0.2
QF_MAX_DUP_BIGRAM_FRAC = 0.6

# SINGLE SOURCE OF TRUTH for quality_filter's reject rules: CASE
# order here IS rule precedence, and QF_REJECT_VERDICTS is derived
# from it, so a rule added to one cannot silently miss the other
# (streaming metrics observe() per-verdict counts against the tuple;
# a verdict missing from it would be folded into the 'duplicate'
# remainder metric — the reconcile test in test_corpus_ingest.py
# pins the streaming/batch agreement).
_QF_RULES: tuple[tuple[str, "object"], ...] = (
    ("too_short", lambda: F.col("n_tokens") < QF_MIN_TOKENS),
    ("dup_words", lambda: F.col("dup_word_frac") > QF_MAX_DUP_WORD_FRAC),
    ("top_word", lambda: F.col("top_word_frac") > QF_MAX_TOP_WORD_FRAC),
    ("dup_bigrams", lambda: F.col("dup_bigram_frac") > QF_MAX_DUP_BIGRAM_FRAC),
)
QF_REJECT_VERDICTS = tuple(v for v, _ in _QF_RULES)


def quality_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X4 — composite keep/drop verdict (C4/Gopher-flavored): combines
    the repetition signals with a length floor; emits the keep flag
    AND the first failed rule, so the pipeline can report per-rule
    rejection rates. Same plan shape as repetition_stats plus one
    map-only CASE projection."""
    rep = repetition_stats(df, text_col, id_col)
    reason = F.lit("keep")
    for verdict, cond in reversed(_QF_RULES):
        reason = F.when(cond(), F.lit(verdict)).otherwise(reason)
    return rep.select(
        id_col,
        "n_tokens",
        reason.alias("verdict"),
        (reason == "keep").alias("kept"),
    )


def _lm_tok_arr(text_col: str) -> Column:
    """Lower-cased whitespace tokens with empties dropped — the LM
    family's shared tokenization (mirrored by the DuckDB oracle)."""
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def _lm_bigram_rows(frame: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc bigram stream ``(id, w1, w2)``: arrays_zip of two
    shifted slices, NOT transform(sequence, element_at(i)) — the zip
    is one codegen'd kernel while the indexed HOF re-walks the array
    per element (measured 3.4x slower on the 10x corpus)."""
    ts = _lm_tok_arr(text_col)
    pairs = F.arrays_zip(
        F.slice(ts, 1, F.size(ts) - 1).alias("w1"),
        F.slice(ts, 2, F.size(ts) - 1).alias("w2"),
    )
    return (
        frame.filter(F.size(ts) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.w1", "p.w2")
    )


def train_bigram_lm(
    lm_df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize the add-k bigram LM's model — the PRODUCTION form
    of bigram_lm_score's model (its docstring's 'persisted count
    tables' path, now real): ``{path}/bigrams`` (w1, w2, bc — count
    DELTAS, aggregated at read), ``{path}/vocab`` (distinct tokens),
    ``{path}/meta`` (n_docs for freshness). Counts are stored as
    mergeable deltas and vocabulary as a distinct-token table —
    addition and set-union are the two merges that make
    append_bigram_lm exact, the property a scalar V or pre-summed
    contexts table would forfeit. Context counts c(w1·) derive from
    the bigram table in the scoring plan (a vocabulary-bounded
    rollup), so there is no second corpus pass and no second table to
    keep consistent. Train once per reference corpus; scoring any
    batch is then ONE corpus pass + vocabulary-keyed joins
    (bigram_lm_score_indexed) — the same build-once/probe-many
    economics as the token and ANN indexes."""
    bg = _lm_bigram_rows(lm_df, text_col, id_col)
    (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("bc"))
        .write.mode("overwrite")
        .parquet(f"{path}/bigrams")
    )
    (
        lm_df.select(F.explode(_lm_tok_arr(text_col)).alias("t"))
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{path}/vocab")
    )
    meta = lm_df.agg(F.count(F.lit(1)).alias("n_docs"))
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def append_bigram_lm(
    delta_df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Incremental LM maintenance: fold a document delta into the
    persisted model by APPENDING its bigram count deltas and distinct
    tokens — O(|delta|) work, the base tables untouched (the
    append_lsh_index/append_ivf_index contract applied to the LM).
    Exactness: bigram counts merge by addition (the read-time rollup
    in bigram_lm_score_indexed), vocabulary merges by set union (the
    read-time distinct) — so score(append) ≡ score(full rebuild),
    pinned in tests. Appends accumulate small files; fold them with
    compact_bigram_lm on the index-compaction cadence."""
    spark = delta_df.sparkSession
    bg = _lm_bigram_rows(delta_df, text_col, id_col)
    (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("bc"))
        .write.mode("append")
        .parquet(f"{path}/bigrams")
    )
    (
        delta_df.select(F.explode(_lm_tok_arr(text_col)).alias("t"))
        .distinct()
        .write.mode("append")
        .parquet(f"{path}/vocab")
    )
    n_prev = spark.read.parquet(f"{path}/meta").first()["n_docs"]
    n_new = int(n_prev) + delta_df.count()
    import os
    import shutil

    tmp = f"{path}/meta__tmp"
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame({"n_docs": [n_new]}), schema="n_docs bigint"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{path}/meta")
    os.rename(tmp, f"{path}/meta")


def compact_bigram_lm(spark, path: str) -> None:
    """Fold appended count deltas and duplicate vocab rows into fully
    aggregated tables (staged write + directory swap, the
    compact_index protocol). Scores are unchanged — the read-time
    rollup makes compaction a pure file-count optimization."""
    import os
    import shutil

    for sub, agg in (
        ("bigrams", lambda d: d.groupBy("w1", "w2").agg(F.sum("bc").alias("bc"))),
        ("vocab", lambda d: d.distinct()),
    ):
        tmp = f"{path}/{sub}__compact_tmp"
        agg(spark.read.parquet(f"{path}/{sub}")).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(f"{path}/{sub}")
        os.rename(tmp, f"{path}/{sub}")


def bigram_lm_score_indexed(
    spark,
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Score a batch against a PERSISTED bigram LM (train_bigram_lm,
    optionally grown by append_bigram_lm): identical values to
    bigram_lm_score when the model was trained on the scored corpus
    (the catalog entry shares its oracle — the index ≡ scan proof, as
    q02d did for token search), but the scoring plan is one corpus
    pass joined to the vocabulary-bounded count tables; unseen
    bigrams fall back to the add-k floor via coalesce(0), exactly as
    the external-lm_df branch of bigram_lm_score does. The count
    rollup and vocab distinct here are what make appended deltas
    exact — both are vocabulary-bounded aggregations, never
    corpus-sized."""
    bc = (
        spark.read.parquet(f"{path}/bigrams")
        .groupBy("w1", "w2")
        .agg(F.sum("bc").alias("bc"))
    )
    uc = bc.groupBy("w1").agg(F.sum("bc").alias("uc"))
    vocab = (
        spark.read.parquet(f"{path}/vocab")
        .agg(F.count_distinct("t").alias("v"))
    )
    nll = -F.log(
        (F.coalesce(F.col("bc"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("uc"), F.lit(0)) + F.lit(k) * F.col("v"))
    )
    return (
        _lm_bigram_rows(df, text_col, id_col)
        .join(bc, ["w1", "w2"], "left")
        .join(uc, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
        )
    )


def bigram_lm_score(
    df: DataFrame,
    lm_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """X4 — statistical-LM fluency score (the CCNet/perplexity-filter
    stage of a training-data pipeline, with the n-gram LM trained
    in-plan instead of shipping a KenLM binary): each document scores
    the mean negative log-likelihood of its token bigrams under an
    add-k-smoothed bigram model,
    ``nll(w1 w2) = -ln((c(w1,w2)+k) / (c(w1·)+k·V))``.
    Low = fluent/common text, high = gibberish or boilerplate-free
    rare text — threshold or bucket it like any quality signal.

    ``lm_df`` is the reference corpus the model is counted from
    (CCNet uses curated text); default is ``df`` itself — self-scored
    fluency, which is what the catalog entry certifies.

    Plan shape at scale: bigram/context counts are explode → hash agg
    with map-side partial combine (two corpus passes over the LM
    side, output bounded by vocabulary² not corpus size); scoring
    joins the document bigram stream to the count tables on the
    bigram key — a vocabulary-keyed shuffle like the TF-IDF join,
    with AQE handling stop-bigram skew — then one per-doc average.
    The vocabulary size V is a broadcast scalar. No Python anywhere;
    rounded to 6 decimals (sum-order noise lives far below).

    This one-shot form re-derives the count tables inside a single
    plan (the oracle-certified shape); a production pipeline
    materializes ``bc``/``uc``/``V`` once per reference corpus — like
    the persisted token index — and scoring is then the single
    vocabulary-keyed join per batch."""
    lm = df if lm_df is None else lm_df

    def tok_arr() -> Column:
        return _lm_tok_arr(text_col)

    def bigram_rows(frame: DataFrame) -> DataFrame:
        return _lm_bigram_rows(frame, text_col, id_col)

    lm_bigrams = bigram_rows(lm)
    bc = lm_bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    # context counts roll up from the bigram counts — same values as
    # counting the corpus again, one fewer corpus pass
    uc = bc.groupBy("w1").agg(F.sum("bc").alias("uc"))
    # Vocabulary size from the COUNT TABLE, not a corpus token
    # explode+distinct: every token of a >=2-token document appears as
    # w1 or w2 of some bigram in bc (all but the last token lead a
    # bigram; the last trails one), so V = distinct(bc.w1 ∪ bc.w2 ∪
    # {tokens of exactly-1-token docs}). The third leg is a tokenize+
    # filter scan with no explode and only its surviving single tokens
    # shuffled; the distinct then runs over vocabulary-bounded rows
    # instead of the corpus token stream. Null/empty texts contribute
    # nothing in either form (split→filter yields a null/empty array).
    # Identical V; interleaved A/B at 10x reads ~5% (the removed
    # explode pass times 1.36 s isolated vs 0.68 s for the added
    # tokenize-only scan, but AQE stage reuse already amortizes the
    # shared bc exchange) — the real case is the 100 TB one: the
    # corpus-token explode+distinct becomes a vocabulary-bounded
    # aggregate over the count table.
    singles = (
        lm.select(tok_arr().alias("_ts"))
        .filter(F.size("_ts") == 1)
        .select(F.element_at("_ts", 1).alias("t"))
    )
    vocab = (
        bc.select(F.col("w1").alias("t"))
        .union(bc.select(F.col("w2").alias("t")))
        .union(singles)
        .agg(F.count_distinct("t").alias("v"))
    )
    nll = -F.log(
        (F.coalesce(F.col("bc"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("uc"), F.lit(0)) + F.lit(k) * F.col("v"))
    )
    if lm_df is None:
        # Self-scored: every scored bigram IS in the model (the score
        # stream and the LM stream are the same relation), so the
        # left-join fallback for unseen bigrams can never fire.
        # Precompute the per-bigram nll on the COUNT table (bc⋈uc is
        # vocabulary-sized, cheap) and join the document stream ONCE
        # on the bigram key — one full-stream shuffle instead of two.
        # Identical values; the oracle is unchanged.
        model = (
            bc.join(uc, ["w1"])
            .crossJoin(F.broadcast(vocab))
            .select("w1", "w2", nll.alias("nll"))
        )
        return (
            bigram_rows(df)
            .join(model, ["w1", "w2"])
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.round(F.avg("nll"), 6).alias("avg_nll"),
            )
        )
    return (
        bigram_rows(df)
        .join(bc, ["w1", "w2"], "left")
        .join(uc, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
        )
    )


def corpus_ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 100
) -> DataFrame:
    """X4 — top-k corpus n-grams by occurrence (not per-doc distinct:
    every occurrence counts, the corpus-statistics flavor used for
    stop-lists and boilerplate detection).

    Plan shape: explode(all n-grams) → hash aggregation with map-side
    partial combine (a document's repeated n-grams collapse before the
    shuffle) → global top-k as TakeOrderedAndProject — only k rows per
    partition cross the final merge, never the n-gram stream.
    """
    from unified_log_aggregation_and_analytics_spark.operators.dedup import token_ngrams

    grams = token_ngrams(tokens(text_col), n)
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(k)
    )


# Document-level quality rules in the style of the Gopher/MassiveText
# filtering stage (Rae et al. 2021, public) and C4 (Raffel et al.
# 2020): cheap deterministic structural thresholds that remove the
# bulk of boilerplate before any model-based scoring. Line-level C4
# rules (terminal punctuation, bullet ratios) degenerate on
# single-line documents, so this operator applies the document-level
# subset; every rule is a codegen string/array expression.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """X4 — Gopher-style document-quality rules: word-count bounds,
    mean-word-length bounds, symbol-to-word ratio ('#'/'...'
    carriers), fraction of words containing a letter, and a
    distinct-stopword floor. Emits each measured quantity, the first
    failed rule (``drop_reason``), and the conjunction ``keep``.

    Map-only, one pass, no shuffle: every rule is an expression over
    the same tokenization — at 100 TB this runs at scan speed and is
    the FIRST stage of the training pipeline, shrinking everything
    downstream. Exact integer counts; the two ratios are single IEEE
    divisions (engine-stable)."""
    toks = tokens(text_col)
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_symbol = F.size(
        F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    out = df.withColumns(
        {
            "n_words": n.cast("long"),
            "mean_word_len": sum_len.cast("double") / n,
            "symbol_ratio": n_symbol.cast("double") / n,
            "alpha_ratio": n_alpha.cast("double") / n,
            "n_stop_hits": n_stop.cast("long"),
        }
    )
    rules = [
        ("too_short", F.col("n_words") < min_words),
        ("too_long", F.col("n_words") > max_words),
        ("word_len_low", F.col("mean_word_len") < min_mean_word_len),
        ("word_len_high", F.col("mean_word_len") > max_mean_word_len),
        ("symbol_heavy", F.col("symbol_ratio") > max_symbol_ratio),
        ("non_alpha", F.col("alpha_ratio") < min_alpha_ratio),
        ("few_stopwords", F.col("n_stop_hits") < min_stop_hits),
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return out.withColumns(
        {"drop_reason": reason, "keep": reason.isNull()}
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
    min_tail: int = 8,
) -> DataFrame:
    """X4 — overlapping-window chunker (the RAG/embedding-prep stage):
    split each document into ``chunk_tokens``-token windows advancing
    by ``stride`` tokens (overlap = chunk_tokens - stride), dropping
    trailing fragments shorter than ``min_tail`` unless they are the
    document's only chunk. A window whose PREDECESSOR already reached
    the document end is dropped too: it would be a strict subset of
    the previous chunk (e.g. 64/48 defaults on a 60-token doc — the
    whole doc is chunk 0, and the 12-token tail window repeats its
    last tokens verbatim), and subset chunks embed and store
    duplicate content in the RAG index for zero retrieval value.

    Plan: window starts come from one ``sequence`` per row and the
    chunks from ``transform`` + ``explode`` — per-row JVM work linear
    in document length, no shuffle, no Python. Output order keys
    (id, chunk_idx) make the op deterministic; downstream embedding
    jobs partition on doc_id so chunks of one document co-locate."""
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.least(F.lit(chunk_tokens), n - s + 1).cast("long").alias(
                "n_chunk_tokens"
            ),
            # predecessor window [1+(i-1)*stride, (i-1)*stride+chunk]
            # already covered the doc -> this window adds nothing
            ((i > 0) & ((i - 1) * stride + chunk_tokens >= n)).alias("_redundant"),
            F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("chunk"),
        ),
    )
    return (
        df.select(id_col, F.explode(chunks).alias("c"))
        .filter(~F.col("c._redundant"))
        .select(id_col, "c.chunk_idx", "c.n_chunk_tokens", "c.chunk")
        .filter(
            (F.col("chunk_idx") == 0) | (F.col("n_chunk_tokens") >= min_tail)
        )
    )


# Fixed public-style linear weights for the classifier-based quality
# score (the fasttext-style stage of CCNet/C4 pipelines, reduced to a
# transparent logistic model over the structural features this module
# already computes). Ordering of the terms is part of the contract:
# the oracle mirrors the exact association order so the IEEE result
# is bit-identical before rounding.
QUALITY_CLF_WEIGHTS = {
    "bias": -2.0,
    "ttr": 1.5,
    "stop_ratio": 6.0,
    "mean_tok_len": 0.1,
    "ln_tokens": 0.35,
}


def quality_classifier(
    df: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """X4 — classifier-based quality scoring: a fixed-weight logistic
    model over the structural features (type-token ratio, stopword
    ratio, mean token length, log token count). Deterministic and
    oracle-checkable — the model is literal weights, not an external
    artifact; swap in a learned model by replacing the weight dict
    (same plan shape). Map-only; the score is rounded to 6 places
    AFTER the sigmoid so a sub-ulp libm difference cannot surface."""
    w = QUALITY_CLF_WEIGHTS
    toks = tokens(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = n_stop.cast("double") / n
    # sum of token lengths == non-whitespace char count — exact for
    # the \s+ tokenizer on ANY whitespace shape; the earlier
    # length - (n-1) form assumed exactly one single-space separator
    # and diverged from the oracle on consecutive/mixed whitespace
    mean_tok_len = (
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")).cast("double") / n
    )
    ln_tokens = F.log(F.lit(1.0) + n.cast("double"))
    z = (
        F.lit(w["bias"])
        + F.lit(w["ttr"]) * ttr
        + F.lit(w["stop_ratio"]) * stop_ratio
        + F.lit(w["mean_tok_len"]) * mean_tok_len
        + F.lit(w["ln_tokens"]) * ln_tokens
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return df.withColumns(
        {
            "clf_score": prob,
            "clf_keep": prob >= F.lit(threshold),
        }
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X4 quality signal — Shannon entropy of each document's
    character distribution (nats, rounded to 6): near-zero for
    degenerate repeated-character text, ~3 for natural language — the
    cheap low-entropy filter pretraining pipelines run before any
    model-based scoring (a pure-expression stand-in for the
    compression-ratio test). Adds ``char_entropy`` to ``df``.

    Plan shape: explode to characters, ONE (doc, char)-keyed hash
    aggregation (map-side partial combine collapses each partition's
    repeats before the shuffle), one doc-keyed aggregation using the
    algebraic identity ``H = ln n - (sum c*ln c)/n`` — whole-stage
    codegen end to end. A first version computed this as per-row
    nested higher-order lambdas (count each distinct char by
    re-filtering the char array); those are INTERPRETED, and at 50x
    corpus it ran 196 s vs ~4 s for this relational form — the
    textbook case for preferring shuffle-and-agg over clever per-row
    expressions when the inner loop isn't codegen."""
    chars = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), ""), lambda x: x != "")).alias(
            "_c"
        ),
    )
    per_doc = (
        chars.groupBy(id_col, "_c")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("_n"),
            F.sum(F.col("_cnt") * F.log(F.col("_cnt"))).alias("_clnc"),
        )
        .select(
            F.col(id_col),
            F.round(
                F.log(F.col("_n")) - F.col("_clnc") / F.col("_n"), 6
            ).alias("char_entropy"),
        )
    )
    return df.join(per_doc, id_col, "left").withColumn(
        "char_entropy", F.coalesce(F.col("char_entropy"), F.lit(0.0))
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    lm_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """X4 — CCNet-style perplexity bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data"): per LANGUAGE, split documents into equal-frequency
    perplexity buckets — head (most fluent third), middle, tail —
    the signal CCNet uses to keep head/middle and drop or down-weight
    tail. Scores come from the add-k bigram LM (bigram_lm_score;
    swap in bigram_lm_score_indexed's persisted model at scale — the
    bucketing tail of the plan is identical).

    Plan shape: the LM scoring plan (vocabulary-keyed joins + per-doc
    average), then ONE language-keyed ntile window ordered by
    (avg_nll, doc_id) — deterministic under score ties because the
    id breaks them. Languages partition the window, so per-partition
    state is the language's document count — at 100 TB bucket by
    (lang, shard-of-lang) or replace ntile with approx-quantile
    thresholds to bound the window partition; the certificate form
    keeps exact ntile, which the oracle replays.
    """
    scores = bigram_lm_score(df, lm_df=lm_df, text_col=text_col, id_col=id_col)
    from pyspark.sql.window import Window

    w = Window.partitionBy(lang_col).orderBy(F.col("avg_nll"), F.col(id_col))
    tile = F.ntile(n_buckets).over(w)
    ids = df.select(F.col(id_col), F.col(lang_col))
    bucketed = ids.join(scores, id_col).select(
        F.col(id_col),
        F.col(lang_col),
        F.col("avg_nll"),
        F.when(tile == 1, F.lit("head"))
        .when(tile == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("ppl_bucket"),
    )
    # docs too short to carry a bigram have no perplexity: emit them
    # explicitly as 'unscored' instead of silently dropping them (the
    # length rules own their verdict — same contract as the streaming
    # LM gate), so every input doc_id appears in the output. The
    # unscored set is exactly {docs with < 2 tokens}: _lm_bigram_rows
    # keeps only size(tokens) >= 2 rows, and every such doc survives
    # scoring in both branches (self-scored: all its bigrams are in
    # the model by construction; external-lm: the joins are left), so
    # a cheap tokenize-and-filter scan replaces the anti-join that
    # would otherwise re-execute the whole LM-scoring subtree a
    # second time (guide §2.4: the union's second branch duplicated
    # every count aggregation and corpus scan).
    ts = _lm_tok_arr(text_col)
    unscored = df.filter(F.coalesce(F.size(ts), F.lit(0)) < 2).select(
        F.col(id_col),
        F.col(lang_col),
        F.lit(None).cast("double").alias("avg_nll"),
        F.lit("unscored").alias("ppl_bucket"),
    )
    return bucketed.unionByName(unscored)


def train_quality_classifier(
    df: DataFrame,
    n_steps: int = 3,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """X4 — distributed TRAINING of the quality classifier (the
    distill-rules-into-a-model stage real pipelines run so the cheap
    scorer can replace the rule cascade): batch gradient descent on a
    logistic model over the structural repetition features, labels =
    the C4/Gopher rule verdict, ``n_steps`` full-batch steps. Returns
    per-document (label, final probability, prediction, agreement).

    Engine-exact determinism (the PageRank playbook, applied to SGD):
    - features are ratios of integers — IEEE-exactly-rounded
      divisions, bit-identical across engines;
    - the link function is the RATIONAL sigmoid
      0.5 + z/(2(1+|z|)) — only +,*,/,abs, every one correctly
      rounded IEEE, so no libm exp() ulp drift can split engines —
      rounded to 6 decimals per step;
    - per-doc gradient contributions round to 9 decimals and
      accumulate as DECIMAL(20,9) — an EXACT, order-free sum, immune
      to float addition-order differences between engines;
    - weights update and round to 6 decimals INSIDE the engine
      (HALF_UP both sides), the driver only carries the rounded
      values (bounded model state, like k-means centroids).
    The gradient per step is a 1-row aggregate job; the returned
    plan scores with literal weights — map-only, no shuffle. At
    scale: steps stream over the persisted feature frame; the model
    is O(features) state.
    """
    def featurize(frame: DataFrame) -> DataFrame:
        rep = repetition_stats(frame, text_col, id_col)
        y = (
            (F.col("n_tokens") >= QF_MIN_TOKENS)
            & (F.col("dup_word_frac") <= QF_MAX_DUP_WORD_FRAC)
            & (F.col("top_word_frac") <= QF_MAX_TOP_WORD_FRAC)
            & (F.col("dup_bigram_frac") <= QF_MAX_DUP_BIGRAM_FRAC)
        ).cast("double")
        return rep.select(
            F.col(id_col),
            F.lit(1.0).alias("x0"),
            (F.least(F.col("n_tokens"), F.lit(200)) / F.lit(200.0)).alias("x1"),
            F.col("dup_word_frac").alias("x2"),
            F.col("top_word_frac").alias("x3"),
            F.col("dup_bigram_frac").alias("x4"),
            y.alias("y"),
        )

    # ``train_df`` fits the weights on a DIFFERENT corpus slice than
    # the one scored (held-out evaluation — generalization, not
    # memorization); default fits on the scored corpus itself.
    feats = featurize(df)
    # Materialize the training-feature frame ONCE (eager
    # localCheckpoint, the dsir_select pattern): every GD step (and,
    # when self-fit, the final scoring) reads the checkpointed
    # 6-column frame (~50 B/doc) instead of re-deriving the
    # repetition aggregation from the corpus — 37.5 s -> 21 s at the
    # 10x corpus for 24 steps; the residual per-step cost is the
    # aggregate evaluation itself. Eager-by-contract (bench times
    # construction, see bench.py EAGER_QUERIES). A handful of
    # partitions keeps the per-step jobs from paying 32-task
    # scheduling overhead each: r14's width sweep at the 10x corpus
    # read 9.9/8.3/6.6/7.0 s per 24 steps for coalesce 1/2/4/8, so
    # r15 adopts the measured optimum (4) as the floor, scaled with
    # cluster width (defaultParallelism/8 — a 256-core cluster gets
    # 32 feature partitions, the bench's local[32] and the driver's
    # 8-CPU re-run both get the measured-fastest 4). The DECIMAL(20,9)
    # gradient sums are order-free, so the trajectory is partition-
    # count-independent (oracle-pinned, re-verified at two SFs).
    _gd_width = max(
        4, feats.sparkSession.sparkContext.defaultParallelism // 8
    )
    train_feats = (feats if train_df is None else featurize(train_df)).coalesce(
        _gd_width
    ).localCheckpoint()
    if train_df is None:
        feats = train_feats
    if not train_feats.head(1):
        # sum() over zero rows is NULL -> every weight would go None
        # and fail opaquely inside the GD loop; surface it here.
        raise ValueError(
            "train_quality_classifier: training slice is empty — "
            "gradient descent needs at least one labeled document"
        )
    xs = ["x0", "x1", "x2", "x3", "x4"]
    w = [0.0] * len(xs)

    def z_expr() -> Column:
        z = F.lit(w[0]) * F.col(xs[0])
        for j in range(1, len(xs)):
            z = z + F.lit(w[j]) * F.col(xs[j])
        return z

    def p_expr() -> Column:
        z = z_expr()
        return F.round(
            F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z))), 6
        )

    # The per-step update is built as ONE SQL string per output weight
    # and parsed JVM-side (the r13 one-parse pattern that cut the
    # prefix-rot probes): constructing the same tree through ~60
    # fine-grained py4j Column calls measured 0.17 s/step of pure
    # driver round-trip latency — half the warm step cost at the 10x
    # corpus (24 steps: 11.9 -> 9.0 s, order-controlled interleaved
    # A/B; weight trajectory bit-identical). The `D` suffix keeps
    # every literal DoubleType — a bare `0.5` parses as DECIMAL and
    # would change the arithmetic; repr() round-trips doubles
    # exactly.
    for _ in range(n_steps):
        z_sql = "(" + " + ".join(
            f"({w[j]!r}D * {xs[j]})" for j in range(len(xs))
        ) + ")"
        p_sql = f"round(0.5D + {z_sql}/(2.0D*(1.0D + abs({z_sql}))), 6)"
        e_sql = f"({p_sql} - y)"
        row = train_feats.agg(
            *[
                F.expr(
                    f"round({w[j]!r}D - {lr!r}D*("
                    f"CAST(sum(CAST(round({e_sql} * {xs[j]}, 9) "
                    f"AS DECIMAL(20,9))) AS DOUBLE)/count(1)), 6) AS w{j}"
                )
                for j in range(len(xs))
            ]
        ).first()
        w = [float(row[f"w{j}"]) for j in range(len(xs))]

    p = p_expr()
    pred = p >= F.lit(0.5)
    return feats.select(
        F.col(id_col),
        F.col("y").alias("label"),
        p.alias("clf_p"),
        pred.alias("pred_keep"),
        (pred == (F.col("y") >= F.lit(0.5))).alias("agrees"),
    )


def cooccurrence_counts(
    df: DataFrame,
    window: int = 2,
    k: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X4 — windowed co-occurrence statistics, the input matrix of
    GloVe-style embedding training (Pennington et al. 2014): for every
    unordered token pair within ``window`` positions, accumulate the
    distance-weighted count (weight 1/d — GloVe's harmonic decay) and
    the raw pair count; return the top-``k`` pairs.

    Plan shape: NO self-join — for each offset d the (t_i, t_{i+d})
    pairs come from arrays_zip of two shifted slices of the token
    array (map-only, one kernel per offset), pairs normalize to
    lexicographic order, and ONE hash aggregation on the uniform pair
    key sums weights corpus-wide (output bounded by vocab², heavily
    partial-combined map-side). Weights are multiples of 1/d for
    d <= 2 (exactly representable doubles), so sums are exact and
    order-free without decimal arithmetic; for window > 2 switch the
    weight to DECIMAL to keep engine-exactness."""
    if not (1 <= window <= 2):
        raise ValueError("window must be 1 or 2 (see docstring for >2)")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    base = df.select(F.col(id_col), F.explode(F.array(toks)).alias("_toks"))
    t = F.col("_toks")
    parts = []
    for d in range(1, window + 1):
        width = F.greatest(F.size(t) - d, F.lit(0))
        zipped = F.arrays_zip(
            F.slice(t, 1, width).alias("a"), F.slice(t, 1 + d, width).alias("b")
        )
        parts.append(
            base.select(F.explode(zipped).alias("p"), F.lit(1.0 / d).alias("weight"))
            .select(
                F.least(F.col("p.a"), F.col("p.b")).alias("w1"),
                F.greatest(F.col("p.a"), F.col("p.b")).alias("w2"),
                "weight",
            )
        )
    pairs = parts[0]
    for more in parts[1:]:
        pairs = pairs.unionByName(more)
    return (
        pairs.groupBy("w1", "w2")
        .agg(
            F.sum("weight").alias("weight"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy(F.col("weight").desc(), "w1", "w2")
        .limit(k)
    )
