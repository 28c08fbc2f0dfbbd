"""Log-domain catalog entries: the reference's transform pipeline
(T1-T3, T9, T10) plus log-analytics queries, each with a DuckDB oracle.

The driver testdata has no raw Apache log files, so the parse queries
synthesize deterministic log lines *inside the query* from the events
table (same construction in the oracle SQL), then parse them back —
a round-trip proof of the T9/T10 extractors against an independent
engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.catalog import _dec, _register, _spread, _t
from unified_log_aggregation_and_analytics_spark.functions.apache_log import (
    parse_apache_combined,
    parse_apache_error,
    parse_lambda_record_line,
)
from unified_log_aggregation_and_analytics_spark.operators import relational as R
from unified_log_aggregation_and_analytics_spark.operators.compat import firehose_ec2_transform


@_register(
    "logs_error_rate",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / COUNT(*) AS error_rate
    FROM events GROUP BY 1
    """,
)
def logs_error_rate(spark, sf_dir):
    """Daily error rate — the Dashboards 'moving error rate'
    visualization as a batch aggregate."""
    ev = _t(spark, sf_dir, "events")
    n_err = F.count(F.when(F.col("event_type") == "error", 1))
    n = F.count(F.lit(1))
    return (
        ev.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
        .groupBy("day")
        .agg(
            n.alias("n_events"),
            n_err.alias("n_errors"),
            (n_err.cast("double") / n).alias("error_rate"),
        )
    )


@_register(
    "logs_json_props",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def logs_json_props(spark, sf_dir):
    """Semi-structured extraction: the events.props JSON column
    (mirrors the reference's untyped JSON payloads, SURVEY.md §1.2)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(k.cast("decimal(18,0)")).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "logs_sessionize",
    """
    WITH us AS (
      -- match Spark's microsecond timestamps for ts-to-ts arithmetic
      SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
    ), g AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM us
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def logs_sessionize(spark, sf_dir):
    """Session counts per user with a 30-minute inactivity gap — the
    batch analog of session_window (ST5); one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    sess = R.sessionize(ev, gap="30 minutes")
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- T9: Apache combined-log parse (synthesized round-trip) -------------

_APACHE_ORACLE = r"""
    WITH lines AS (
      SELECT event_id,
             printf('%s - user%d [%s +0000] "GET /page/%d HTTP/1.1" %d %d "-" "agent/%d"',
                    '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR),
                    user_id,
                    strftime(ts, '%d/%b/%Y:%H:%M:%S'),
                    event_id % 50,
                    ([200,301,404,500,503])[CAST(event_id % 5 AS INT) + 1],
                    CAST(floor(value * 1000) AS BIGINT),
                    user_id % 7) AS value
      FROM events
    )
    SELECT event_id,
           regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 1) AS client_ip,
           strptime(regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 2), '%d/%b/%Y:%H:%M:%S %z')::TIMESTAMP AS ts,
           regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 3) AS method,
           regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 4) AS path,
           CAST(regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 5) AS INTEGER) AS status,
           CAST(regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 6) AS BIGINT) AS bytes,
           regexp_extract(value, '^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ?[^"]*" (\d{3}) (\S+)(?: "[^"]*" "(.*)")?\s*$', 7) AS user_agent
    FROM lines
"""


@_register("logs_apache_parse", _APACHE_ORACLE)
def logs_apache_parse(spark, sf_dir):
    """T9 — Apache combined-format field extraction
    (reference README.md:47 sample, README.md:58 intended enrichment).
    Log lines are synthesized deterministically from events, then parsed
    back with the engine's regex extractor; the oracle does the same in
    DuckDB, proving extractor equivalence."""
    ev = _spread(_t(spark, sf_dir, "events"))
    status = F.element_at(
        F.array(F.lit(200), F.lit(301), F.lit(404), F.lit(500), F.lit(503)),
        (F.col("event_id") % 5).cast("int") + 1,
    )
    lines = ev.select(
        "event_id",
        F.format_string(
            '%s - user%d [%s +0000] "GET /page/%d HTTP/1.1" %d %d "-" "agent/%d"',
            F.concat_ws(
                ".",
                F.lit("10"),
                F.lit("0"),
                (F.col("user_id") % 256).cast("string"),
                (F.col("event_id") % 256).cast("string"),
            ),
            F.col("user_id"),
            F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
            F.col("event_id") % 50,
            status,
            F.floor(F.col("value") * 1000),
            F.col("user_id") % 7,
        ).alias("value"),
    )
    parsed = parse_apache_combined(lines.select("event_id", "value"), "value")
    return parsed.select(
        "event_id", "client_ip", "ts", "method", "path", "status", "bytes", "user_agent"
    )


# --- T9b: Apache error-log parse (synthesized round-trip) ---------------
# The reference tails error_log* into the same stream as access_log*
# (lib/computes/ec2/ec2-startup.sh:46-49); even ids synthesize the 2.2
# shape, odd ids the 2.4 shape (module:level, pid, client:port), so one
# query exercises every optional group of APACHE_ERROR_RE.

_ERRLOG_RE_SQL = (
    r"^\[([^\]]+)\] \[(?:([a-z_]+):)?([a-z]+[0-9]?)\]"
    r"(?: \[pid (\d+)(?::tid \d+)?\])?"
    r"(?: \[client ([^\]]+)\])? (.*)$"
)

_ERRLOG_ORACLE = f"""
    WITH base AS (
      SELECT event_id, ts,
             (['error','warn','notice','info','crit'])[CAST(event_id % 5 AS INT) + 1] AS lvl,
             '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) AS ip,
             'File does not exist: /var/www/html/page' || CAST(event_id % 50 AS VARCHAR) AS msg
      FROM events
    ),
    lines AS (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0 THEN
               printf('[%s] [%s] [client %s] %s',
                      strftime(ts, '%a %b %d %H:%M:%S %Y'), lvl, ip, msg)
             ELSE
               printf('[%s] [core:%s] [pid %d] [client %s:%d] %s',
                      strftime(ts, '%a %b %d %H:%M:%S %Y'), lvl,
                      event_id % 32768, ip, 40000 + event_id % 1000, msg)
             END AS value
      FROM base
    )
    SELECT event_id,
           strptime(regexp_replace(regexp_replace(
               regexp_extract(value, '{_ERRLOG_RE_SQL}', 1),
               '^[A-Za-z]+ ', ''), ' +', ' '), '%b %d %H:%M:%S %Y') AS ts,
           NULLIF(regexp_extract(value, '{_ERRLOG_RE_SQL}', 2), '') AS module,
           NULLIF(regexp_extract(value, '{_ERRLOG_RE_SQL}', 3), '') AS level,
           CAST(NULLIF(regexp_extract(value, '{_ERRLOG_RE_SQL}', 4), '') AS BIGINT) AS pid,
           regexp_replace(NULLIF(regexp_extract(value, '{_ERRLOG_RE_SQL}', 5), ''),
                          ':[0-9]+$', '') AS client_ip,
           NULLIF(regexp_extract(value, '{_ERRLOG_RE_SQL}', 6), '') AS message
    FROM lines
"""


@_register("logs_error_parse", _ERRLOG_ORACLE)
def logs_error_parse(spark, sf_dir):
    """T9b — Apache error-log field extraction
    (functions/apache_log.py parse_apache_error). Same
    synthesize-then-parse round-trip as logs_apache_parse: both the
    2.2 and 2.4 line shapes are built deterministically from events,
    parsed back by the engine, and reproduced independently in DuckDB."""
    ev = _spread(_t(spark, sf_dir, "events"))
    lvl = F.element_at(
        F.array(F.lit("error"), F.lit("warn"), F.lit("notice"), F.lit("info"), F.lit("crit")),
        (F.col("event_id") % 5).cast("int") + 1,
    )
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        F.lit("0"),
        (F.col("user_id") % 256).cast("string"),
        (F.col("event_id") % 256).cast("string"),
    )
    ts_str = F.date_format("ts", "EEE MMM dd HH:mm:ss yyyy")
    msg = F.concat(
        F.lit("File does not exist: /var/www/html/page"),
        (F.col("event_id") % 50).cast("string"),
    )
    line22 = F.format_string("[%s] [%s] [client %s] %s", ts_str, lvl, ip, msg)
    line24 = F.format_string(
        "[%s] [core:%s] [pid %d] [client %s:%d] %s",
        ts_str, lvl, F.col("event_id") % 32768, ip,
        F.lit(40000) + F.col("event_id") % 1000, msg,
    )
    lines = ev.select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, line22).otherwise(line24).alias("value"),
    )
    return parse_apache_error(lines, "value").select(
        "event_id", "ts", "module", "level", "pid", "client_ip", "message"
    )


@_register(
    "logs_tab_parse",
    """
    WITH lines AS (
      SELECT event_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') || chr(9) ||
             'req-' || CAST(event_id AS VARCHAR) || chr(9) ||
             upper(event_type) || chr(9) ||
             'value=' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) AS record
      FROM events
    )
    SELECT event_id,
           CAST(str_split(record, chr(9))[1] AS TIMESTAMP) AS log_ts,
           str_split(record, chr(9))[2] AS request_id,
           str_split(record, chr(9))[3] AS level,
           trim(str_split(record, chr(9))[4]) AS log_message
    FROM lines
    """,
)
def logs_tab_parse(spark, sf_dir):
    """T10 — tab-separated Lambda function-log record parse
    (reference README.md:119,136; produced by the sample handler's
    console.log). Same synthesize-then-parse round-trip as T9."""
    ev = _spread(_t(spark, sf_dir, "events"))
    lines = ev.select(
        "event_id",
        F.concat_ws(
            "\t",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.concat(F.lit("req-"), F.col("event_id").cast("string")),
            F.upper("event_type"),
            F.concat(F.lit("value="), F.floor(F.col("value") * 100).cast("string")),
        ).alias("record"),
    )
    return parse_lambda_record_line(lines, "record").select(
        "event_id", "log_ts", "request_id", "level", "log_message"
    )


@_register(
    "logs_envelope_roundtrip",
    """
    SELECT CAST(doc_id AS VARCHAR) AS "recordId",
           'Ok' AS result,
           to_base64(CAST(CAST(json_object('logs', text) AS VARCHAR) AS BLOB)) AS data
    FROM documents
    """,
)
def logs_envelope_roundtrip(spark, sf_dir):
    """T1/T2/T3/T8 — byte-faithful EC2 Firehose transformer
    (reference ec2/lambda/index.js:1-17) applied to a synthesized
    envelope: base64-decode, wrap as {"logs": ...}, re-encode, tag Ok.
    The oracle rebuilds the exact same JSON + base64 in DuckDB."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("recordId"),
        F.base64(F.col("text").cast("binary")).alias("data"),
    )
    return firehose_ec2_transform(docs)


# --- Product-analytics views over the event stream ---------------------
# (the alerting/BI layer the reference delegates to OpenSearch
# Dashboards — funnels, retention, and log templating are the three
# queries every log-analytics user builds first)


@_register(
    "logs_funnel",
    """
    WITH us AS (
      SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
      FROM events
    ), v AS (
      SELECT user_id, MIN(ts) AS t1 FROM us
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT us.user_id, MIN(us.ts) AS t2
      FROM us JOIN v ON us.user_id = v.user_id AND us.ts > v.t1
      WHERE us.event_type = 'click' GROUP BY us.user_id
    ), p AS (
      SELECT us.user_id, MIN(us.ts) AS t3
      FROM us JOIN c ON us.user_id = c.user_id AND us.ts > c.t2
      WHERE us.event_type = 'purchase' GROUP BY us.user_id
    )
    SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ORDER BY stage
    """,
)
def logs_funnel(spark, sf_dir):
    """Ordered funnel conversion (view → click → purchase): each stage
    is the user's FIRST qualifying event strictly after the previous
    stage's timestamp — the sequence-match semantics dashboards call a
    funnel. Expressed as three stacked whole-partition window minima
    over the SAME user-id partitioning: t1 = min(view ts), t2 =
    min(click ts > t1), t3 = min(purchase ts > t2) — each window sees
    the previous stage's column, so the strict ordering decorrelates
    without any self-join. ONE scan of the event table and ONE
    user-keyed exchange (Catalyst reuses the partitioning across the
    stacked windows and the per-user collapse); the earlier
    agg-and-join-per-stage form re-scanned the table six times. The
    1-row stage-count frame then unpivots via stack()."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', n1, '2_click', n2, '3_purchase', n3)"
        ).alias("stage", "n_users")
    ).orderBy("stage")


@_register(
    "logs_retention_cohorts",
    """
    WITH us AS (
      SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
    ), f AS (
      SELECT user_id, MIN(ts) AS first_ts FROM us GROUP BY user_id
    )
    SELECT CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
           CAST((epoch_us(us.ts) - epoch_us(f.first_ts))
                // 604800000000 AS INT) AS week_k,
           CAST(COUNT(DISTINCT us.user_id) AS BIGINT) AS n_users
    FROM us JOIN f ON us.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def logs_retention_cohorts(spark, sf_dir):
    """Retention-cohort triangle: users grouped by first-seen week,
    counted distinct in each subsequent week offset — THE engagement
    view of product analytics. week_k is integer microsecond
    arithmetic ((ts - first_ts) // week), immune to calendar/timezone
    edge cases; the cohort label is the ISO week of first activity.
    Two user-keyed shuffles (first-seen agg, cohort re-join) + one
    grouped count-distinct over a few dozen cells."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    week_us = 7 * 24 * 3600 * 1000000
    return (
        ev.join(f, "user_id")
        .groupBy(
            F.to_date(F.date_trunc("week", F.col("first_ts"))).alias("cohort_week"),
            (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("first_ts").cast("timestamp"))
                )
                / F.lit(week_us)
            )
            .cast("int")
            .alias("week_k"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_k")
    )


@_register(
    "logs_templates",
    r"""
    WITH lines AS (
      SELECT printf('%s - user%d [%s +0000] "%s /%s/%d HTTP/1.1" %d %d "-" "agent/%d"',
                    '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR),
                    user_id,
                    strftime(ts, '%d/%b/%Y:%H:%M:%S'),
                    CASE WHEN event_type IN ('click','purchase','signup')
                         THEN 'POST' ELSE 'GET' END,
                    event_type,
                    event_id % 50,
                    ([200,301,404,500,503])[CAST(event_id % 5 AS INT) + 1],
                    CAST(floor(value * 1000) AS BIGINT),
                    user_id % 7) AS line
      FROM events
    )
    SELECT regexp_replace(line, '[0-9]+', '<N>', 'g') AS template,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lines
    GROUP BY 1
    ORDER BY n DESC, template
    LIMIT 20
    """,
)
def logs_templates(spark, sf_dir):
    """Log-template mining (the Drain-style first pass): mask every
    digit run to <N> and count the resulting structural templates —
    collapsing millions of raw lines into the handful of message
    shapes that generated them. Pure regexp_replace + hash agg: one
    shuffle keyed by template (low cardinality by construction),
    top-20 as TakeOrderedAndProject. Input lines are the same
    synthesized Apache stream the T9 parse oracle round-trips; method
    and path word vary with event_type so distinct structural
    templates survive the digit masking."""
    ev = _spread(_t(spark, sf_dir, "events"))
    status = F.element_at(
        F.array(F.lit(200), F.lit(301), F.lit(404), F.lit(500), F.lit(503)),
        (F.col("event_id") % 5).cast("int") + 1,
    )
    method = F.when(
        F.col("event_type").isin("click", "purchase", "signup"), F.lit("POST")
    ).otherwise(F.lit("GET"))
    lines = ev.select(
        F.format_string(
            '%s - user%d [%s +0000] "%s /%s/%d HTTP/1.1" %d %d "-" "agent/%d"',
            F.concat_ws(
                ".",
                F.lit("10"),
                F.lit("0"),
                (F.col("user_id") % 256).cast("string"),
                (F.col("event_id") % 256).cast("string"),
            ),
            F.col("user_id"),
            F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
            method,
            F.col("event_type"),
            F.col("event_id") % 50,
            status,
            F.floor(F.col("value") * 1000),
            F.col("user_id") % 7,
        ).alias("value"),
    )
    return (
        lines.select(
            F.regexp_replace(F.col("value"), "[0-9]+", "<N>").alias("template")
        )
        .groupBy("template")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "template")
        .limit(20)
    )


@_register(
    "logs_ewma_anomaly",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), contrib AS (
      SELECT d.event_type,
             d.day + CAST(o.i AS INTEGER) AS tday,
             d.n * CAST(power(0.5, o.i) AS DECIMAL(8,6)) AS wn,
             CAST(power(0.5, o.i) AS DECIMAL(8,6)) AS w
      FROM d, (SELECT unnest(range(0, 7)) AS i) o
    ), sm AS (
      SELECT d.event_type, d.day, d.n,
             round(CAST(SUM(c.wn) AS DOUBLE) / CAST(SUM(c.w) AS DOUBLE), 6)
               AS ewma
      FROM d JOIN contrib c
        ON c.event_type = d.event_type AND c.tday = d.day
      GROUP BY d.event_type, d.day, d.n
    )
    SELECT event_type, day, n, ewma,
           round(n / ewma, 6) AS ratio,
           (n / ewma > 1.5 OR n / ewma < 0.5) AS is_anomaly
    FROM sm
    """,
)
def logs_ewma_anomaly(spark, sf_dir):
    """EWMA volume-anomaly detection: per-type daily counts smoothed
    by a 7-day finite-window exponential moving average (alpha=0.5),
    each day scored as the ratio of its count to the smoothed level —
    the adaptive-baseline alert the z-score view (q08c) can't give
    when traffic trends.

    Exact cross-engine: the weights 0.5^i (i<7) are exact binary
    fractions carried as DECIMAL(8,6), so the weighted sums are exact
    in both engines; only the final division goes through double
    (rounded to 6 dp). Partial windows at series start renormalize by
    the sum of PRESENT weights — no warm-up NULLs.

    Plan shape at scale: no range join and no ordered window walk —
    each daily count replicates to the <=7 target days it contributes
    to (map-side explode of a 7-element sequence), then ONE equi-join
    on (type, day) + hash agg. Day-partitionable, skew-free (keys are
    (type, day) cells), and the window width is a constant factor on
    a relation that is already ~|types| x |days| tiny relative to the
    raw events."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = F.pow(F.lit(0.5), F.col("i")).cast("decimal(8,6)")
    contrib = d.select(
        "event_type",
        "day",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
    ).select(
        F.col("event_type").alias("c_type"),
        F.date_add("day", F.col("i")).alias("tday"),
        (F.col("n") * w).alias("wn"),
        w.alias("w"),
    )
    sm = (
        d.join(
            contrib,
            (F.col("c_type") == F.col("event_type")) & (F.col("tday") == F.col("day")),
        )
        .groupBy("event_type", "day", "n")
        .agg(
            F.round(
                F.sum("wn").cast("double") / F.sum("w").cast("double"), 6
            ).alias("ewma")
        )
    )
    ratio = F.col("n") / F.col("ewma")
    return sm.select(
        "event_type",
        "day",
        "n",
        "ewma",
        F.round(ratio, 6).alias("ratio"),
        ((ratio > 1.5) | (ratio < 0.5)).alias("is_anomaly"),
    )


# --- Geo/CIDR enrichment (r13) ------------------------------------------

_GEO_ORACLE = """
    WITH ips AS (
      SELECT event_id, user_id,
             167772160 + (user_id % 256) * 256 + (event_id % 256) AS ip_num
      FROM events
    ),
    w AS (
      SELECT k, ([512, 1024, 2048, 4096])[CAST(k % 4 AS INT) + 1] AS width
      FROM (SELECT unnest(range(0, 64)) AS k)
    ),
    geo AS (
      SELECT printf('net-%02d', k) AS network,
             (['us-east', 'us-west', 'eu-central', 'ap-south'])[CAST(k % 4 AS INT) + 1] AS region,
             167772160 + COALESCE(SUM(width) OVER (
               ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
             167772160 + COALESCE(SUM(width) OVER (
               ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + width - 1 AS hi
      FROM w
    )
    SELECT g.network, g.region,
           COUNT(*) AS n_events,
           COUNT(DISTINCT i.user_id) AS n_users
    FROM ips i JOIN geo g ON i.ip_num BETWEEN g.lo AND g.hi
    GROUP BY 1, 2
    ORDER BY 1
"""


@_register("logs_geo_enrich", _GEO_ORACLE)
def logs_geo_enrich(spark, sf_dir):
    """Geo/CIDR enrichment (r13, verdict item 5) — the one analytics
    sliver OpenSearch ships that the engine lacked: client IPs
    (reference README.md:47; synthesized 10.0.x.y exactly as
    logs_apache_parse does) looked up against a network-range table
    (deterministic RFC-1918 ranges with variable /23–/20 widths — the
    irregularity is what makes it a real range join, not a prefix
    equi-join). The lookup is operators/relational.py
    range_lookup_binned: ranges explode to their covered bins,
    BROADCAST, points equi-join on their single bin, exact BETWEEN
    filters collisions — never a BroadcastNestedLoopJoin (the
    full-catalog plan sweep guards it). At 100 TB the points side is
    map-only; per-network rollup is one partial+final agg."""
    ev = _t(spark, sf_dir, "events")
    ips = ev.select(
        "event_id",
        "user_id",
        (
            F.lit(167772160)
            + (F.col("user_id") % 256) * 256
            + (F.col("event_id") % 256)
        ).alias("ip_num"),
    )
    k = F.col("id")
    width = F.element_at(
        F.array(F.lit(512), F.lit(1024), F.lit(2048), F.lit(4096)),
        (k % 4).cast("int") + 1,
    )
    off = F.coalesce(
        F.sum("width").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    geo = (
        spark.range(64)
        .select(k.alias("k"), width.alias("width"))
        .select(
            F.format_string("net-%02d", F.col("k")).alias("network"),
            F.element_at(
                F.array(
                    F.lit("us-east"),
                    F.lit("us-west"),
                    F.lit("eu-central"),
                    F.lit("ap-south"),
                ),
                (F.col("k") % 4).cast("int") + 1,
            ).alias("region"),
            (F.lit(167772160) + off).alias("lo"),
            (F.lit(167772160) + off + F.col("width") - 1).alias("hi"),
        )
    )
    return (
        R.range_lookup_binned(ips, geo, "ip_num", bin_size=1024)
        .groupBy("network", "region")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("network")
    )


# --- Geo grid aggregation (r14) -------------------------------------------

_GEO_GRID_ORACLE = """
    WITH pts AS (
      SELECT event_id, user_id,
             (user_id * 7919 + event_id * 104729) % 180000 AS lat_md,
             (user_id * 104729 + event_id * 7919) % 360000 AS lon_md
      FROM events
    ),
    cells AS (
      SELECT event_id, user_id,
             (lon_md * 16) // 360000 AS cx,
             (lat_md * 16) // 180000 AS cy
      FROM pts
    )
    SELECT (((cx >> 0) & 1) << 0) | (((cy >> 0) & 1) << 1) | (((cx >> 1) & 1) << 2) | (((cy >> 1) & 1) << 3) | (((cx >> 2) & 1) << 4) | (((cy >> 2) & 1) << 5) | (((cx >> 3) & 1) << 6) | (((cy >> 3) & 1) << 7) AS geocell,
           cx AS tile_x, cy AS tile_y,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM cells
    GROUP BY 1, 2, 3
    ORDER BY 1
"""


@_register("logs_geo_grid", _GEO_GRID_ORACLE)
def logs_geo_grid(spark, sf_dir):
    """Geo grid aggregation (r14, verdict item 6) — the
    geohash_grid/geotile_grid bucket behind OpenSearch Dashboards map
    visualizations (the Discover map panel of the reference's UI,
    README.md:295-314): points bucket into a 2^4 x 2^4 tile grid and
    each tile's ordinates interleave into ONE integer Morton cell id
    (sources/batch.morton_z — the same kernel write_zordered clusters
    layouts with; a geohash is exactly this interleave base32-coded).
    Coordinates are synthesized deterministically from the events
    table in integer MILLI-degrees (the logs_geo_enrich convention:
    no float in the key path, both engines replay bit-for-bit), cell
    ordinates are pure integer division, the id is 8 bits of codegen
    bit arithmetic. Plan: map-only projection + one partial+final agg
    on a bounded key domain (256 cells) — at 100 TB the cheapest
    aggregation shape there is; finer zooms widen the key domain
    geometrically (bits is the knob) but never add a shuffle."""
    from unified_log_aggregation_and_analytics_spark.sources.batch import morton_z

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        "user_id",
        ((F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000).alias(
            "lat_md"
        ),
        ((F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000).alias(
            "lon_md"
        ),
    )
    cells = pts.select(
        "event_id",
        "user_id",
        F.expr("(lon_md * 16) div 360000").cast("long").alias("cx"),
        F.expr("(lat_md * 16) div 180000").cast("long").alias("cy"),
    )
    return (
        cells.select(
            morton_z(F.col("cx"), F.col("cy"), 4).alias("geocell"),
            F.col("cx").alias("tile_x"),
            F.col("cy").alias("tile_y"),
            "user_id",
        )
        .groupBy("geocell", "tile_x", "tile_y")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("geocell")
    )


_GEO_DIST_ORACLE = """
    WITH pts AS (
      SELECT event_id, user_id,
             (user_id * 7919 + event_id * 104729) % 180000 AS lat_md,
             (user_id * 104729 + event_id * 7919) % 360000 AS lon_md
      FROM events
    ),
    d AS (
      SELECT user_id,
             (lat_md - 90000) * (lat_md - 90000)
               + (lon_md - 180000) * (lon_md - 180000) AS d2
      FROM pts
    )
    SELECT CASE WHEN d2 < 900000000 THEN 'ring_00_30'
                WHEN d2 < 3600000000 THEN 'ring_30_60'
                WHEN d2 < 8100000000 THEN 'ring_60_90'
                ELSE 'ring_90_plus' END AS ring,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM d
    GROUP BY 1
    ORDER BY 1
"""


@_register("logs_geo_distance", _GEO_DIST_ORACLE)
def logs_geo_distance(spark, sf_dir):
    """Geo distance-ring aggregation (r14) — OpenSearch's
    geo_distance bucket (concentric rings around a point of
    interest, the other half of the Dashboards map story next to
    logs_geo_grid's tiles): points bucket by squared planar distance
    from the grid center, compared against squared ring radii — no
    sqrt, no float, the whole key path stays integer arithmetic both
    engines replay bit-for-bit (coordinates synthesized in
    milli-degrees exactly as logs_geo_grid). Plan: map-only CASE +
    one partial+final agg on a 4-value key — at 100 TB the shuffle
    carries 4 rows per partition."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000
    lon = (F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000
    d2 = (lat - 90000) * (lat - 90000) + (lon - 180000) * (lon - 180000)
    ring = (
        F.when(d2 < 30000 * 30000, "ring_00_30")
        .when(d2 < 60000 * 60000, "ring_30_60")
        .when(d2 < 90000 * 90000, "ring_60_90")
        .otherwise("ring_90_plus")
    )
    return (
        ev.select(ring.alias("ring"), "user_id")
        .groupBy("ring")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("ring")
    )


_GEO_BOUNDS_ORACLE = """
    WITH pts AS (
      SELECT event_type,
             (user_id * 7919 + event_id * 104729) % 180000 AS lat_md,
             (user_id * 104729 + event_id * 7919) % 360000 AS lon_md
      FROM events
    )
    SELECT event_type,
           MIN(lat_md) AS min_lat_md, MAX(lat_md) AS max_lat_md,
           MIN(lon_md) AS min_lon_md, MAX(lon_md) AS max_lon_md,
           round(AVG(lat_md), 6) AS centroid_lat_md,
           round(AVG(lon_md), 6) AS centroid_lon_md,
           COUNT(*) AS n_events
    FROM pts
    GROUP BY 1
    ORDER BY 1
"""


@_register("logs_geo_bounds", _GEO_BOUNDS_ORACLE)
def logs_geo_bounds(spark, sf_dir):
    """Geo bounds + centroid aggregation (r14) — OpenSearch's
    geo_bounds (tightest bounding box per bucket) and geo_centroid
    (weighted mean point) metric aggs, the remaining two geo
    aggregations behind the Dashboards map panel: per event type,
    min/max of each ordinate plus the mean point. Coordinates stay
    in integer milli-degrees (the logs_geo_grid synthesis); the
    centroid is the one float in the family — an integer-sum /
    count division both engines compute identically (int64 sum,
    one double divide, round 6). Plan: one partial+final agg over a
    bounded key domain — four extrema, two sums, a count per key."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000
    lon = (F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000
    return (
        ev.select("event_type", lat.alias("lat_md"), lon.alias("lon_md"))
        .groupBy("event_type")
        .agg(
            F.min("lat_md").alias("min_lat_md"),
            F.max("lat_md").alias("max_lat_md"),
            F.min("lon_md").alias("min_lon_md"),
            F.max("lon_md").alias("max_lon_md"),
            F.round(F.avg("lat_md"), 6).alias("centroid_lat_md"),
            F.round(F.avg("lon_md"), 6).alias("centroid_lon_md"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


_GEO_HASH_ORACLE = """
    WITH pts AS (
      SELECT event_id, user_id,
             (user_id * 7919 + event_id * 104729) % 180000 AS lat_md,
             (user_id * 104729 + event_id * 7919) % 360000 AS lon_md
      FROM events
    ),
    cells AS (
      SELECT user_id,
             (lon_md * 32) // 360000 AS cx,
             (lat_md * 32) // 180000 AS cy
      FROM pts
    ),
    z AS (SELECT user_id, (((cy >> 0) & 1) << 0) | (((cx >> 0) & 1) << 1) | (((cy >> 1) & 1) << 2) | (((cx >> 1) & 1) << 3) | (((cy >> 2) & 1) << 4) | (((cx >> 2) & 1) << 5) | (((cy >> 3) & 1) << 6) | (((cx >> 3) & 1) << 7) | (((cy >> 4) & 1) << 8) | (((cx >> 4) & 1) << 9) AS z10 FROM cells)
    SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(z10 // 32 AS INT) + 1, 1)
             || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(z10 % 32 AS INT) + 1, 1) AS geohash,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM z
    GROUP BY 1
    ORDER BY 1
"""


@_register("logs_geo_hash", _GEO_HASH_ORACLE)
def logs_geo_hash(spark, sf_dir):
    """Geohash-grid aggregation, base32 STRING form (r14) — the
    letter-exact geohash_grid bucket key OpenSearch returns
    (precision 2 = 10 bits): a geohash IS the Morton interleave of
    the range-halving bits, longitude first from the MSB — which is
    exactly ``morton_z(cy, cx, 5)`` over the 5-bit tile ordinates
    (lat on even positions, lon on odd) — base32-coded through the
    standard geohash alphabet (no a/i/l/o). Same integer
    milli-degree synthesis as logs_geo_grid; the alphabet lookup is
    one substr per 5-bit group, JVM-side. Hand pin: (user 8, event
    0) -> cx=10, cy=11 -> z=205 -> '6e' (tests/test_relational.py)."""
    from unified_log_aggregation_and_analytics_spark.sources.batch import morton_z

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        ((F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180000).alias("lat_md"),
        ((F.col("user_id") * 104729 + F.col("event_id") * 7919) % 360000).alias("lon_md"),
    )
    cells = pts.select(
        "user_id",
        F.expr("(lon_md * 32) div 360000").cast("long").alias("cx"),
        F.expr("(lat_md * 32) div 180000").cast("long").alias("cy"),
    )
    z10 = morton_z(F.col("cy"), F.col("cx"), 5)
    # substr(alphabet, idx+1, 1) per 5-bit group — JVM expressions
    c1 = F.expr(f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(z10 div 32 AS INT) + 1, 1)")
    c2 = F.expr(f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(z10 % 32 AS INT) + 1, 1)")
    return (
        cells.withColumn("z10", z10)
        .select(F.concat(c1, c2).alias("geohash"), "user_id")
        .groupBy("geohash")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("geohash")
    )
