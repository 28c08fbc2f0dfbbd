"""Property-based tests (SURVEY.md §5 item 5, hypothesis):

- random Apache combined log lines round-trip through the T9 parser
  (parse -> reassemble == original line);
- random Lambda telemetry event arrays preserve exactly the multiset
  of `function` events through T4-T7 (parse -> explode -> filter).

Strategies are bounded and deterministic (derandomize) so CI time is
stable; each property runs a single Spark job over all generated
examples at once — one JVM round-trip instead of one per example.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, example, given, settings, strategies as st

from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.functions.apache_log import (
    parse_apache_combined,
)
from unified_log_aggregation_and_analytics_spark.operators.transforms import (
    lambda_telemetry_transform,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

ip = st.tuples(*[st.integers(0, 255)] * 4).map(lambda t: ".".join(map(str, t)))
token = st.text("abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=12)
path = st.lists(token, min_size=1, max_size=4).map(lambda ps: "/" + "/".join(ps))
method = st.sampled_from(["GET", "POST", "PUT", "DELETE", "HEAD", "PATCH"])
status = st.integers(100, 599)
nbytes = st.one_of(st.just("-"), st.integers(0, 10**9).map(str))
# no backslashes or double quotes: the combined format cannot escape them
agent = st.text(
    st.characters(codec="ascii", exclude_characters='"\\\r\n'), min_size=1, max_size=40
)
day = st.integers(1, 28)
month = st.sampled_from(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
)
clock = st.tuples(st.integers(0, 23), st.integers(0, 59), st.integers(0, 59))


@st.composite
def apache_line(draw):
    h, m, s = draw(clock)
    ts = f"{draw(day):02d}/{draw(month)}/2021:{h:02d}:{m:02d}:{s:02d} +0000"
    return (
        f'{draw(ip)} - - [{ts}] "{draw(method)} {draw(path)} HTTP/1.1" '
        f'{draw(status)} {draw(nbytes)} "-" "{draw(agent)}"'
    )


@given(lines=st.lists(apache_line(), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_apache_parse_roundtrip(spark, lines):
    """Reassembling the parsed fields reproduces every input line, and
    ts/status/bytes are typed (never null) for well-formed lines."""
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    parsed = parse_apache_combined(df)
    rebuilt = parsed.select(
        F.concat(
            "client_ip", F.lit(" "), "identd", F.lit(" "), "user",
            F.lit(" ["), F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss Z"), F.lit("] \""),
            "method", F.lit(" "), "path", F.lit(" "), "protocol", F.lit("\" "),
            F.col("status").cast("string"), F.lit(" "),
            F.coalesce(F.col("bytes").cast("string"), F.lit("-")),
            F.lit(" \""), "referer", F.lit("\" \""), "user_agent", F.lit("\""),
        ).alias("line"),
        "_raw",
        F.col("ts").isNotNull().alias("has_ts"),
    ).collect()
    for r in rebuilt:
        assert r.has_ts
        assert r.line == r._raw


fn_record = st.text(
    st.characters(codec="ascii", exclude_characters="\\\r\n\t"), min_size=0, max_size=30
).map(lambda m: f"2021-07-29T19:54:09.096Z\treq-1\tINFO\t{m}")

event = st.one_of(
    st.fixed_dictionaries(
        {"time": st.just("2021-07-29T19:54:09.096Z"), "type": st.just("function"),
         "record": fn_record}
    ),
    st.fixed_dictionaries(
        {"time": st.just("2021-07-29T19:54:08.949Z"),
         "type": st.sampled_from(
             ["platform.start", "platform.end", "platform.report", "platform.extension"]
         ),
         "record": st.just("{}")}
    ),
)


@given(batches=st.lists(st.lists(event, max_size=8), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_lambda_transform_preserves_function_event_multiset(spark, batches):
    """T4-T7: exactly the `function` events survive, each exactly once
    (reference transformer/index.js:7-12 drops every platform.* event)."""
    df = spark.createDataFrame(
        [(json.dumps(b),) for b in batches], ["payload"]
    )
    out = lambda_telemetry_transform(df).select("record").collect()
    got = sorted(r.record for r in out)
    expect = sorted(
        e["record"] for b in batches for e in b if e["type"] == "function"
    )
    assert got == expect


_MONTH_NUM = {
    m: i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}
err_level = st.sampled_from(["error", "warn", "notice", "info", "crit", "debug"])
err_module = st.one_of(st.none(), st.sampled_from(["core", "mpm_prefork", "ssl", "auth_basic"]))


@st.composite
def error_line(draw):
    """A structured Apache error-log line (2.2 or 2.4 shape depending
    on which optional groups are drawn) plus its expected parse."""
    import datetime as dt

    lvl = draw(err_level)
    mod = draw(err_module)
    p = draw(st.one_of(st.none(), st.integers(1, 65535)))
    client = draw(st.one_of(st.none(), ip))
    port = draw(st.one_of(st.none(), st.integers(1024, 65535)))
    h, m, s = draw(clock)
    d = draw(day)
    mon = draw(month)
    us = draw(st.one_of(st.none(), st.integers(0, 999999)))
    ts_txt = f"Wed {mon} {d:02d} {h:02d}:{m:02d}:{s:02d}"
    if us is not None:
        ts_txt += f".{us:06d}"
    ts_txt += " 2021"
    parts = [f"[{ts_txt}]", f"[{mod}:{lvl}]" if mod else f"[{lvl}]"]
    if p is not None:
        parts.append(f"[pid {p}]")
    if client is not None:
        parts.append(f"[client {client}:{port}]" if port else f"[client {client}]")
    # leading alpha keeps the message from mimicking an optional group
    msg = "m" + draw(
        st.text(st.characters(codec="ascii", exclude_characters="\\\r\n"), max_size=30)
    )
    expected = {
        "module": mod,
        "level": lvl,
        "pid": p,
        "client_ip": client,
        "message": msg,
        "ts": dt.datetime(2021, _MONTH_NUM[mon], d, h, m, s, us or 0),
    }
    return " ".join(parts) + " " + msg, expected


@given(cases=st.lists(error_line(), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_apache_error_parse_fields(spark, cases):
    """T9b: every combination of the error-log format's optional
    groups (module prefix, pid/tid, client with/without port,
    fractional seconds) parses to exactly the generating fields."""
    from unified_log_aggregation_and_analytics_spark.functions.apache_log import (
        parse_apache_error,
    )

    df = spark.createDataFrame([(l,) for l, _ in cases], ["value"])
    rows = {r._raw: r for r in parse_apache_error(df).collect()}
    assert len(rows) == len({l for l, _ in cases})
    for line, exp in cases:
        r = rows[line]
        got = {
            "module": r.module,
            "level": r.level,
            "pid": r.pid,
            "client_ip": r.client_ip,
            "message": r.message,
            "ts": r.ts,
        }
        assert got == exp, f"line {line!r}: {got} != {exp}"


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    c=st.sampled_from([1, 2, 3, 4]),
    f=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_codec_roundtrip_property(w, h, c, f, seed):
    """PNG round-trip holds for ARBITRARY pixel content, every shape,
    every color layout, every scanline filter — the decoder's five
    unfilter paths are exact inverses of the encoder's filters (no
    Spark needed: the codec is pure numpy/stdlib)."""
    import numpy as np

    from unified_log_aggregation_and_analytics_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)
    gw, gh, gc, out = decode_png(encode_png(px, filter_type=f))
    assert (gw, gh, gc) == (w, h, c)
    assert np.array_equal(out, px)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=0, max_size=9,
        ).map(" ".join),
        min_size=1, max_size=6,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_token_ngrams_zip_equals_indexed_form(spark, texts, n):
    """The arrays_zip n-gram kernel (token_ngrams) is bit-identical to
    the indexed transform(sequence, i -> slice) form it replaced — for
    every text shape including sub-n-token rows — so the refactor of
    shingles/DSIR/phrase/bigrams onto one kernel changed no value."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.dedup import (
        token_ngrams,
        tokens,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    toks = tokens("text")
    indexed = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    rows = df.select(
        token_ngrams(toks, n).alias("zipped"), indexed.alias("indexed")
    ).collect()
    for r in rows:
        assert r.zipped == r.indexed


# --- span-level dedup (X2 dedup_substring) -----------------------------

span_token = st.sampled_from(["a", "b", "c", "d"])
span_doc = st.lists(span_token, min_size=1, max_size=12)
span_corpus = st.lists(span_doc, min_size=2, max_size=5)


def _ref_spans(docs_tokens: dict, k: int, min_count: int):
    """Brute-force Python reference for duplicated_spans."""
    from collections import Counter

    grams = []
    for d, toks in docs_tokens.items():
        n = len(toks)
        for p in range(1, max(n - k + 1, 1) + 1):
            grams.append((d, p, " ".join(toks[p - 1 : p - 1 + k])))
    cnt = Counter(g for _, _, g in grams)
    out = {}
    for d, toks in docs_tokens.items():
        n = len(toks)
        covered = set()
        for dd, p, g in grams:
            if dd == d and cnt[g] >= min_count:
                covered.update(range(p, min(p + k - 1, n) + 1))
        spans, prev = 0, None
        for i in sorted(covered):
            if prev is None or i != prev + 1:
                spans += 1
            prev = i
        out[d] = (n, len(covered), spans)
    return out


@given(st.lists(span_corpus, min_size=1, max_size=6), st.sampled_from([2, 3]))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicated_spans_matches_bruteforce(spark, corpora, k):
    """duplicated_spans == brute-force reference on random 4-symbol
    corpora (heavy forced collisions). Corpora batch into ONE Spark
    job: per-corpus token prefixes keep gram spaces disjoint, so the
    global run decomposes into the independent per-corpus answers."""
    from unified_log_aggregation_and_analytics_spark.operators.dedup import (
        duplicated_spans,
    )

    docs_tokens, rows = {}, []
    for ci, corpus in enumerate(corpora):
        for di, toks in enumerate(corpus):
            doc_id = ci * 1000 + di
            ptoks = [f"c{ci}_{t}" for t in toks]
            docs_tokens[doc_id] = ptoks
            rows.append((doc_id, " ".join(ptoks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"], r["dup_frac"])
        for r in duplicated_spans(df, k=k, min_count=2).collect()
    }
    want = _ref_spans(docs_tokens, k, 2)
    assert set(got) == set(want)
    for d, (n, dup, spans) in want.items():
        gn, gdup, gspans, gfrac = got[d]
        assert (gn, gdup, gspans) == (n, dup, spans), f"doc {d}"
        assert abs(gfrac - round(dup / n, 6)) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    color=st.booleans(),
    subsample=st.sampled_from(["444", "420"]),
    rst=st.sampled_from([0, 1, 2]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@example(w=3, h=3, color=False, subsample="444", rst=0, seed=2507)
def test_jpeg_codec_property(w, h, color, subsample, rst, seed):
    """Baseline-JPEG invariants that hold for ARBITRARY content,
    shape, layout, subsampling, and restart cadence (pure
    numpy/stdlib, no Spark): geometry and channel count survive
    exactly; a restart stream decodes byte-identically to its
    non-restart twin; GRAY pixels stay within the provable flat-16
    envelope (64 coefficients x quant error 8 x max basis product
    1/4 = 128 — color noise has no such bound: 4:2:0 legitimately
    averages saturated random chroma away); and constant-color
    images, whose blocks are DC-only, reconstruct within the DC
    quantization envelope: up to ~1 LSB error per YCbCr plane,
    amplified by the inverse transform to |dB| <= |dY| +
    1.772*|dCb| + rounding ~= 3.3, so the per-channel bound is 4
    (seed 2507 / 3x3 flat (178,151,238) hits 3 legitimately)."""
    import numpy as np

    from unified_log_aggregation_and_analytics_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if color else (h, w)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    sub = subsample if color else "444"
    enc = encode_jpeg(px, subsample=sub, restart_interval=rst)
    gw, gh, gc, out = decode_jpeg(enc)
    assert (gw, gh, gc) == (w, h, 3 if color else 1)
    if not color:
        assert np.abs(out[:, :, 0].astype(int) - px.astype(int)).max() <= 128
    if rst:
        plain = decode_jpeg(encode_jpeg(px, subsample=sub))[3]
        assert np.array_equal(out, plain)

    flat = np.full((h, w, 3), rng.randint(0, 256, size=3), dtype=np.uint8)
    fout = decode_jpeg(encode_jpeg(flat, subsample=sub))[3]
    assert np.abs(fout.astype(int) - flat.astype(int)).max() <= 4


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    oh=st.integers(min_value=1, max_value=12),
    ow=st.integers(min_value=1, max_value=12),
    gray=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
# r11: the non-divisible edge cases pinned as standing examples (the
# JPEG-property-test convention) so they run every session, not only
# when Hypothesis happens to generate them: odd->even (center-nearest
# on both axes), 1xN / Nx1 degenerate strips (each axis alone), mixed
# divisible-row / non-divisible-column, and upscale (oh > h: the
# center-map (2i+1)*src // (2*dst) must stay in range and repeat
# source pixels, never read out of bounds).
@example(h=3, w=5, oh=2, ow=2, gray=False, seed=7)
@example(h=1, w=7, oh=1, ow=3, gray=True, seed=11)
@example(h=7, w=1, oh=3, ow=1, gray=False, seed=13)
@example(h=6, w=7, oh=3, ow=3, gray=False, seed=17)
@example(h=2, w=3, oh=5, ow=9, gray=True, seed=19)
@example(h=1, w=1, oh=12, ow=12, gray=False, seed=23)
def test_resize_rgb_property(h, w, oh, ow, gray, seed):
    """resize_rgb invariants for arbitrary geometry (pure numpy):
    output shape/dtype always match the request; on divisible dims
    every output byte equals the independently-computed rounded block
    mean (so values stay inside the block's [min, max]); on
    non-divisible dims every output pixel IS some source pixel at the
    integer center-mapped index; constant images are resize-invariant
    under BOTH strategies."""
    import numpy as np

    from unified_log_aggregation_and_analytics_spark.operators.multimodal import (
        resize_rgb,
    )

    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = resize_rgb(px, ow, oh)
    assert out.dtype == np.uint8
    assert out.shape == ((oh, ow) if gray else (oh, ow, 3))

    px3 = px[:, :, None] if gray else px
    out3 = out[:, :, None] if gray else out
    if h % oh == 0 and w % ow == 0:
        fy, fx = h // oh, w // ow
        ref = np.floor(
            px3.astype(np.int64).reshape(oh, fy, ow, fx, -1).sum(axis=(1, 3))
            / (fy * fx)
            + 0.5
        )
        assert np.array_equal(out3, ref.astype(np.uint8))
    else:
        ys = ((2 * np.arange(oh) + 1) * h) // (2 * oh)
        xs = ((2 * np.arange(ow) + 1) * w) // (2 * ow)
        assert np.array_equal(out3, px3[np.ix_(ys, xs)])

    flat = np.full_like(px, px.reshape(-1)[0])
    assert np.all(resize_rgb(flat, ow, oh) == px.reshape(-1)[0])


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    ch=st.integers(min_value=1, max_value=2),
    bits16=st.booleans(),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_pcm_encode_decode_roundtrip_property(n, ch, bits16, rate, seed):
    """encode_wav_pcm ∘ decode_wav is the identity on PCM sample
    arrays for arbitrary length/channels/width/rate — byte-exact
    container round-trip, the contract resample_audio's re-encode
    relies on."""
    import numpy as np

    from unified_log_aggregation_and_analytics_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm,
    )

    rng = np.random.RandomState(seed)
    if bits16:
        samples = rng.randint(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
    else:
        samples = rng.randint(0, 256, size=(n, ch), dtype=np.uint8)
    payload = encode_wav_pcm(samples, rate, channels=ch)
    got_rate, got_ch, got_bits, got_frames, arr = decode_wav(payload)
    assert (got_rate, got_ch, got_bits, got_frames) == (
        rate, ch, 16 if bits16 else 8, n,
    )
    assert np.array_equal(arr.reshape(n, ch), samples)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=16,
        ),
        min_size=1,
        max_size=8,
    ).filter(lambda vs: len({len(v) for v in vs}) == 1),
)
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@example(vecs=[[0.0, 0.0, 0.0, 0.0]])          # constant vector: sc == 0
@example(vecs=[[1e-12, 0.0, -1e-12, 0.0]])     # near-degenerate range
def test_sq8_property(spark, vecs):
    """SQ8 invariants on adversarial vectors (Hypothesis): (1) codes
    stay in [0, 255]; (2) the Arrow encoder and the scan-time JVM
    expressions assign IDENTICAL codes (the IEEE-parity claim the
    persisted index rests on); (3) the reconstruction error of every
    element is bounded by sc/2 (+1 ulp slack) — the provable envelope
    of round-to-nearest range quantization; constant vectors
    reconstruct exactly."""
    from unified_log_aggregation_and_analytics_spark.operators import similarity as S

    dim = len(vecs[0])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        schema="vec_id bigint, embedding array<double>",
    )
    enc = {r.vec_id: r for r in S.sq8_encode(df).collect()}
    assert set(enc) == set(range(len(vecs)))

    for i, v in enumerate(vecs):
        r = enc[i]
        assert list(r.sq8_code) == list(r.sq8_codes)
        assert all(0 <= c <= 255 for c in r.sq8_codes)
        mn, mx = min(v), max(v)
        sc = (mx - mn) / 255.0
        # JVM scan-time replay of the same quantization
        if sc == 0:
            jvm = [0] * dim
        else:
            import math

            jvm = [int(math.floor((x - mn) / sc + 0.5)) for x in v]
        assert list(r.sq8_codes) == jvm, "Arrow encoder != JVM arithmetic"
        for x, c in zip(v, r.sq8_codes):
            recon = r.mn + c * r.sc
            bound = (r.sc / 2.0) * (1 + 1e-9) + 1e-15
            assert abs(x - recon) <= bound, (x, recon, r.sc)


@given(
    texts=st.lists(
        st.text(
            alphabet=" \t\nabcxyz019",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=10,
    ),
)
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@example(texts=[" leading space"])
@example(texts=["trailing space "])
@example(texts=["\t\n  "])          # whitespace-only: zero tokens
@example(texts=["a  b\tc\nd"])      # runs of mixed whitespace
def test_hash_embed_cross_engine_property(spark, texts):
    r"""hash_embed vs the catalog's DuckDB CTE chain on ADVERSARIAL
    whitespace (Hypothesis): leading/trailing/mixed/empty. Pins the
    empty-token contract — BOTH engines keep edge empties from a \s+
    split (Spark's F.split uses limit=-1, DuckDB's str_split_regex
    likewise), and the operator/oracle pair must filter '' identically
    on both."""
    import duckdb

    from unified_log_aggregation_and_analytics_spark.catalog_llm import (
        _HASH_EMBED_CTES,
    )
    from unified_log_aggregation_and_analytics_spark.operators import text as X

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.bucket): r.val for r in X.hash_embed(df, dim=64).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"WITH {_HASH_EMBED_CTES} SELECT doc_id, bucket, val FROM vecs_named"
        ).fetchall()
    }
    assert got == want
