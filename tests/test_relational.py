"""Unit tests for relational-operator helpers."""
def test_glob_to_like_escapes():
    """OpenSearch wildcard syntax: backslash escapes glob metachars;
    LIKE metachars and bare backslashes always match literally."""
    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        _glob_to_like,
    )

    assert _glob_to_like("s*k") == "s%k"
    assert _glob_to_like("a?b") == "a_b"
    assert _glob_to_like(r"foo\*") == "foo*"
    assert _glob_to_like(r"foo\?x") == "foo?x"
    assert _glob_to_like("100%") == r"100\%"
    assert _glob_to_like("a_b") == r"a\_b"
    assert _glob_to_like("a\\") == "a\\\\"
    assert _glob_to_like(r"c\\d") == "c\\\\d"


def test_term_suggest_ranking(spark):
    """Term suggester (r11): hand-computed corrections for a 4-doc
    corpus — distance ascending first, document frequency (distinct
    docs) breaking distance ties, token breaking frequency ties; the
    query term itself never suggested; max_edits respected."""
    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        term_suggest,
    )

    docs = spark.createDataFrame(
        [
            (0, "table batch table"),   # 'table' twice in one doc: df=1
            (1, "table cable"),
            (2, "cable label batch"),
            (3, "tab tabled stable"),
        ],
        "doc_id long, text string",
    )
    got = [(r.token, r.distance, r.doc_freq) for r in
           term_suggest(docs, "tabel", k=10, max_edits=2).collect()]
    # Levenshtein to 'tabel' (no transposition primitive): label 1;
    # table/tab/tabled 2; cable/stable 3 (out); batch 4 (out).
    # 'table' appears in docs 0 and 1 but twice in doc 0 -> df=2.
    assert got == [
        ("label", 1, 1),
        ("table", 2, 2),
        ("tab", 2, 1),
        ("tabled", 2, 1),
    ]


def test_phrase_suggest_collocation_gate(spark):
    """Phrase suggester (r11): only CO-OCCURRING word pairs can be
    suggested — per-term-valid corrections whose pair never appears
    as a corpus bigram are absent; ranking is (total distance asc,
    bigram frequency desc); the input phrase itself is excluded;
    non-two-word input is loud."""
    import pytest

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        phrase_suggest,
    )

    docs = spark.createDataFrame(
        [
            (0, "fast table fast table fast table"),
            (1, "fast label"),
            (2, "query label"),  # 'label' co-occurs only after 'query'
        ],
        "doc_id long, text string",
    )
    got = [(r.suggestion, r.distance, r.n_occurrences) for r in
           phrase_suggest(docs, "fsat tabel", k=10, max_edits=2).collect()]
    # 'label' is the best per-term correction of 'tabel' (1 edit) but
    # is only suggested in pairs that actually occur: 'fast label'
    # (3, once) ranks first; 'query label' is absent (query>2 edits);
    # 'fast table' (2+2=4) follows with its frequency of 3 — the two
    # interleaved 'table fast' occurrences are a different bigram.
    assert got == [("fast label", 3, 1), ("fast table", 4, 3)]
    with pytest.raises(ValueError, match="two-word"):
        phrase_suggest(docs, "one two three")


def test_collapse_hits_semantics(spark):
    """Field collapsing (r12): page shows the top page_size GROUPS by
    their best hit, each with up to inner_hits rows tagged hit_rank;
    a group with one row yields one row; groups outside the page are
    absent even when their second-best hit beats a paged group's
    best."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        collapse_hits,
    )

    rows = [
        # (custkey, orderkey, price)
        (1, 10, 900.0), (1, 11, 850.0), (1, 12, 800.0),
        (2, 20, 1000.0),                      # single-order customer
        (3, 30, 700.0), (3, 31, 650.0),
        (4, 40, 600.0),                        # best hit below the page
    ]
    df = spark.createDataFrame(rows, "ck long, ok long, price double")
    got = [
        (r.ck, r.ok, r.hit_rank)
        for r in collapse_hits(
            df, "ck", [F.col("price").desc(), F.col("ok")], page_size=3, inner_hits=2
        ).orderBy(F.col("price").desc(), "ok").collect()
    ]
    # Page = customers 2 (1000), 1 (900), 3 (700); cust 1's third
    # order is cut by inner_hits=2; cust 4 is off the page entirely.
    assert got == [
        (2, 20, 1),
        (1, 10, 1), (1, 11, 2),
        (3, 30, 1), (3, 31, 2),
    ]


def test_grouped_top_hits_matches_plain_window(spark):
    """Salted two-phase top_hits (r12): result set is EXACTLY the
    plain single-window per-group top-k (every true top-k row
    survives phase 1 because local rank <= global rank), for k both
    below and above the group sizes, at several salt widths."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        grouped_top_hits,
    )

    rows = [(i % 3, i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, id long, v double")
    order = [F.col("v").desc(), F.col("id")]
    w = Window.partitionBy("g").orderBy(*order)
    for k in (1, 5, 100):
        expect = {
            (r.g, r.id, r.rk)
            for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .collect()
        }
        for n_salt in (1, 4, 32):
            got = {
                (r.g, r.id, r.hit_rank)
                for r in grouped_top_hits(
                    df, ["g"], order, k=k, salt_col="id", n_salt=n_salt
                ).collect()
            }
            assert got == expect, (k, n_salt)


def test_phrase_prefix_semantics(spark):
    """match_phrase_prefix (r12): leading tokens exact-consecutive,
    last token prefix; interior-token prefixes do NOT match (the
    gram's space pins them); exact full-token match still counts."""
    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        phrase_prefix_search,
    )

    docs = spark.createDataFrame(
        [
            (0, "the fast table wins"),       # 'fast tab' prefix of 'table'
            (1, "a fast tab stop"),           # exact token match
            (2, "breakfast table set"),       # 'fast' embedded in 'breakfast'
            (3, "fast car tab"),              # not consecutive
            (4, "so fast tablecloth fast tabby"),  # two matches in one doc
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.n_matches)
        for r in phrase_prefix_search(docs, "fast tab").collect()
    }
    assert got == {(0, 1), (1, 1), (4, 2)}


def test_adjacency_matrix_one_pass(spark):
    """adjacency_matrix (r12): per-filter and pairwise-intersection
    counts from ONE aggregate (hand-checked), empty buckets dropped,
    keys sorted; plan carries a single Aggregate over the source."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        adjacency_matrix,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "a long, b long"
    )
    got = [
        (r.key, r.doc_count)
        for r in adjacency_matrix(
            df,
            {
                "lo": F.col("a") <= 2,
                "ev": F.col("a") % 2 == 0,
                "never": F.col("a") > 99,
            },
        ).collect()
    ]
    # lo={1,2} ev={2,4} lo&ev={2}; 'never' and its pairs drop
    assert got == [("ev", 2), ("ev&lo", 1), ("lo", 2)]


def test_rank_eval_hand_computed(spark):
    """rank_eval (r12): metrics pinned by hand on a corpus where the
    BM25 top-k and tf>=2 judgments are enumerable. 'aa' occurs twice
    in docs 0,1 (relevant) and once in doc 2; all three rank. With
    k=3: p@3 = 2/3, MRR = 1 (a relevant doc ranks first — tf=2 beats
    tf=1 under BM25 for the same length), NDCG = (1/log2(2) +
    1/log2(3)) / ideal(2) = 1.0 when both relevant docs fill the top
    two slots."""
    import math

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        rank_eval,
    )

    docs = spark.createDataFrame(
        [
            (0, "aa aa xx yy"),
            (1, "aa aa zz ww"),
            (2, "aa bb cc dd"),
            (3, "ee ff gg hh"),
        ],
        "doc_id long, text string",
    )
    rows = rank_eval(docs, ["aa"], k=3, min_tf=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.query_term == "aa" and r.n_relevant == 2
    assert r.precision_at_3 == round(2 / 3.0, 6)
    assert r.mrr == 1.0
    ideal = 1 / math.log2(2) + 1 / math.log2(3)
    assert r.ndcg_at_3 == round((1 / math.log2(2) + 1 / math.log2(3)) / ideal, 6) == 1.0


def test_adjacency_matrix_rejects_unsafe_names(spark):
    """ADVICE r12: filter names reach the stack() expression and the
    '&' pair-key convention — quotes and '&' must be rejected, not
    silently corrupt the unpivot."""
    import pytest
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        adjacency_matrix,
    )

    df = spark.createDataFrame([(1,)], "a long")
    for bad in ("a'b", "a&b"):
        with pytest.raises(ValueError, match="adjacency_matrix filter name"):
            adjacency_matrix(df, {bad: F.col("a") > 0})


def test_rank_eval_absent_term_scores_zero(spark):
    """ADVICE r12: a query term matching ZERO documents still yields a
    metrics row (n_relevant=0, all metrics 0.0 — the OpenSearch
    _rank_eval contract), instead of silently vanishing; present
    terms are unaffected."""
    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        rank_eval,
    )

    docs = spark.createDataFrame(
        [(0, "aa aa xx yy"), (1, "aa aa zz ww"), (2, "aa bb cc dd")],
        "doc_id long, text string",
    )
    rows = rank_eval(docs, ["aa", "zzzz"], k=3, min_tf=2).collect()
    assert [r.query_term for r in rows] == ["aa", "zzzz"]
    z = rows[1]
    assert (z.n_relevant, z.precision_at_3, z.mrr, z.ndcg_at_3) == (0, 0.0, 0.0, 0.0)
    assert rows[0].n_relevant == 2 and rows[0].mrr == 1.0


def test_percentile_ranks_pinned(spark, tmp_path):
    """Verdict r12 item 8: hand-computed pin for the q06j
    percentile_ranks aggregation (not just the replayed oracle).
    Type 'a' values [10,50,100,150]: rank_50 = 2/4 = 50%,
    rank_100 = 3/4 = 75%, rank_200 = 4/4 = 100%; type 'b' [300]:
    all zero."""
    import unified_log_aggregation_and_analytics_spark.catalog as C

    ev = spark.createDataFrame(
        [("a", 10.0), ("a", 50.0), ("a", 100.0), ("a", 150.0), ("b", 300.0)],
        "event_type string, value double",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: (r.rank_50, r.rank_100, r.rank_200)
        for r in C.QUERIES["q06j_percentile_ranks"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"a": (50.0, 75.0, 100.0), "b": (0.0, 0.0, 0.0)}


def test_extended_stats_pinned(spark, tmp_path):
    """Verdict r12 item 8: hand-computed pin for q06k extended_stats.
    Values [1,2,3,6]: avg=3, var_pop=(4+1+0+9)/4=3.5,
    std=sqrt(3.5)=1.870829, sigma-2 bounds 3 -/+ 2*std."""
    import math

    import unified_log_aggregation_and_analytics_spark.catalog as C

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 6.0)],
        "event_type string, value double",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    r = C.QUERIES["q06k_extended_stats"].spark_fn(spark, str(tmp_path)).first()
    std = round(math.sqrt(3.5), 6)
    assert (r.n, r.min_v, r.max_v, r.avg_v, r.sum_v) == (4, 1.0, 6.0, 3.0, 12.0)
    assert (r.variance, r.std_dev) == (3.5, std)
    assert r.std_lower == round(3.0 - 2 * math.sqrt(3.5), 6)
    assert r.std_upper == round(3.0 + 2 * math.sqrt(3.5), 6)


def test_range_lookup_binned_hand_computed(spark):
    """range_lookup_binned (r13): point-in-range matches pinned by
    hand — including a point on a bin boundary whose range lives in
    the previous bin (the collision the exact BETWEEN must keep) and
    an uncovered point (dropped, inner semantics); plan carries no
    BroadcastNestedLoopJoin."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        range_lookup_binned,
    )

    pts = spark.createDataFrame(
        [(1, 5), (2, 100), (3, 1024), (4, 5000)], "pid long, v long"
    )
    rng = spark.createDataFrame(
        [("a", 0, 99), ("b", 100, 2047), ("z", 3000, 3999)],
        "name string, lo long, hi long",
    )
    out = range_lookup_binned(pts, rng, "v", bin_size=1024)
    got = sorted((r.pid, r.name) for r in out.select("pid", "name").collect())
    # v=5 -> a; v=100 -> b; v=1024 -> b (range b spans the bin edge);
    # v=5000 -> uncovered, dropped
    assert got == [(1, "a"), (2, "b"), (3, "b")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_matrix_stats_pinned(spark, tmp_path):
    """Hand-computed pin for q06n_matrix_stats. value [1,2,3,6],
    user_id [1,1,2,2]: var_pop(value)=3.5, m3=4.5 -> skew=4.5/
    (sqrt(3.5)*3.5)=0.6872, m4=24.5 -> kurt=2.0; user_id m3=0 ->
    skew 0, kurt 1.0 (two-point symmetric); cov_pop=0.75, corr=
    0.75/(sqrt(3.5)*0.5)=0.801784."""
    import unified_log_aggregation_and_analytics_spark.catalog as C

    ev = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 2), (6.0, 2)],
        "value double, user_id long",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    rows = {
        r.field: r
        for r in C.QUERIES["q06n_matrix_stats"].spark_fn(
            spark, str(tmp_path)
        ).collect()
    }
    v = rows["value"]
    assert (v.n, v.mean, v.variance) == (4, 3.0, 3.5)
    assert (v.skewness, v.kurtosis) == (0.6872, 2.0)
    assert (v.covariance, v.correlation) == (0.75, 0.801784)
    u = rows["user_id"]
    assert (u.mean, u.variance, u.skewness, u.kurtosis) == (1.5, 0.25, 0.0, 1.0)


def test_geo_grid_morton_pinned(spark):
    """Hand-computed pin for logs_geo_grid's kernel (r14). For
    user_id=8, event_id=0: lat_md = 8*7919 = 63352, lon_md =
    8*104729 mod 360000 = 117832; tile ordinates cx = 117832*16 div
    360000 = 5, cy = 63352*16 div 180000 = 5; Morton interleave of
    (5, 5) = 0b0101/0b0101 -> 0b110011 = 51. Every synthesized point
    additionally cross-checks against an independent plain-Python
    integer replay."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.sources.batch import morton_z

    rows = [(e, u) for e in (0, 1, 7, 123, 4096) for u in (0, 3, 8, 77)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    pts = df.select(
        "event_id",
        "user_id",
        ((F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000).alias("lat_md"),
        ((F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000).alias("lon_md"),
    ).select(
        "event_id",
        "user_id",
        F.expr("(lon_md * 16) div 360000").cast("long").alias("cx"),
        F.expr("(lat_md * 16) div 180000").cast("long").alias("cy"),
    )
    got = {
        (r.event_id, r.user_id): (r.cx, r.cy, r.z)
        for r in pts.select(
            "event_id", "user_id", "cx", "cy",
            morton_z(F.col("cx"), F.col("cy"), 4).alias("z"),
        ).collect()
    }
    assert got[(0, 8)] == (5, 5, 51)  # the literal hand case

    def z_py(cx, cy):
        z = 0
        for b in range(4):
            z |= ((cx >> b) & 1) << (2 * b)
            z |= ((cy >> b) & 1) << (2 * b + 1)
        return z

    for e, u in rows:
        lat_md = (u * 7919 + e * 104729) % 180000
        lon_md = (u * 104729 + e * 7919) % 360000
        cx, cy = (lon_md * 16) // 360000, (lat_md * 16) // 180000
        assert got[(e, u)] == (cx, cy, z_py(cx, cy)), (e, u)


def test_geo_distance_rings_pinned(spark):
    """Hand-computed pin for logs_geo_distance's key path (r14). For
    user_id=8, event_id=0: lat_md=63352, lon_md=117832; d2 =
    26648^2 + 62168^2 = 710115904 + 3864860224 = 4574976128, which
    sits in [3.6e9, 8.1e9) -> ring_60_90. All synthesized points
    cross-check against a plain-Python integer replay."""
    from pyspark.sql import functions as F

    rows = [(e, u) for e in (0, 1, 7, 123, 4096) for u in (0, 3, 8, 77)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    lat = (F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000
    lon = (F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000
    d2c = (lat - 90000) * (lat - 90000) + (lon - 180000) * (lon - 180000)
    ring = (
        F.when(d2c < 30000 * 30000, "ring_00_30")
        .when(d2c < 60000 * 60000, "ring_30_60")
        .when(d2c < 90000 * 90000, "ring_60_90")
        .otherwise("ring_90_plus")
    )
    got = {
        (r.event_id, r.user_id): (r.d2, r.ring)
        for r in df.select(
            "event_id", "user_id", d2c.alias("d2"), ring.alias("ring")
        ).collect()
    }
    assert got[(0, 8)] == (4574976128, "ring_60_90")

    for e, u in rows:
        lat_md = (u * 7919 + e * 104729) % 180000
        lon_md = (u * 104729 + e * 7919) % 360000
        d2 = (lat_md - 90000) ** 2 + (lon_md - 180000) ** 2
        exp = (
            "ring_00_30" if d2 < 9e8 else
            "ring_30_60" if d2 < 3.6e9 else
            "ring_60_90" if d2 < 8.1e9 else "ring_90_plus"
        )
        assert got[(e, u)] == (d2, exp), (e, u)


def test_geo_hash_base32_pinned(spark):
    """Hand-computed pin for logs_geo_hash (r14): (user 8, event 0)
    -> lat_md=63352, lon_md=117832 -> 5-bit ordinates cx=10 (0b01010),
    cy=11 (0b01011) -> geohash interleave (lon at odd bit positions)
    z10 = 1+4+64 + 8+128 = 205 -> chars (205>>5, 205&31) = (6, 13)
    -> '6e' in the standard alphabet. Plus a plain-Python replay of
    every synthesized point."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.sources.batch import morton_z

    ALPH = "0123456789bcdefghjkmnpqrstuvwxyz"
    rows = [(e, u) for e in (0, 1, 7, 123, 4096) for u in (0, 3, 8, 77)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    cells = df.select(
        "event_id",
        "user_id",
        ((F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000).alias("lat_md"),
        ((F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000).alias("lon_md"),
    ).select(
        "event_id",
        "user_id",
        F.expr("(lon_md * 32) div 360000").cast("long").alias("cx"),
        F.expr("(lat_md * 32) div 180000").cast("long").alias("cy"),
    ).withColumn("z10", morton_z(F.col("cy"), F.col("cx"), 5))
    got = {
        (r.event_id, r.user_id): (r.cx, r.cy, r.z10, r.gh)
        for r in cells.select(
            "event_id", "user_id", "cx", "cy", "z10",
            F.concat(
                F.expr(f"substr('{ALPH}', CAST(z10 div 32 AS INT) + 1, 1)"),
                F.expr(f"substr('{ALPH}', CAST(z10 % 32 AS INT) + 1, 1)"),
            ).alias("gh"),
        ).collect()
    }
    assert got[(0, 8)] == (10, 11, 205, "6e")

    for e, u in rows:
        lat_md = (u * 7919 + e * 104729) % 180000
        lon_md = (u * 104729 + e * 7919) % 360000
        cx, cy = (lon_md * 32) // 360000, (lat_md * 32) // 180000
        z = 0
        for b in range(5):
            z |= ((cy >> b) & 1) << (2 * b)
            z |= ((cx >> b) & 1) << (2 * b + 1)
        assert got[(e, u)] == (cx, cy, z, ALPH[z >> 5] + ALPH[z & 31]), (e, u)
