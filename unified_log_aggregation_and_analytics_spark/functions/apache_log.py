"""Log-line field extraction (operators T9/T10).

T9: Apache combined-format parsing. The reference ships raw access-log
lines (sample at reference README.md:47) and explicitly calls out
extracting "the timestamp, HTTP, and browser information ... as
separate attributes" as the intended enrichment (README.md:58). Built
entirely from ``regexp_extract`` + ``to_timestamp`` — JVM-side, inside
whole-stage codegen; no Python in the hot path.

T10: Lambda function-log record lines are tab-separated
``ts\\trequestId\\tLEVEL\\tmessage`` (reference README.md:119,136,
produced by lib/computes/lambda/handler/index.js console.log).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Apache combined log format. Groups:
# 1 client_ip, 2 identd, 3 user, 4 timestamp, 5 method, 6 path,
# 7 protocol, 8 status, 9 bytes ('-' for none), 10 referer, 11 user_agent
APACHE_COMBINED_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ?([^"]*)" '
    r'(\d{3}) (\S+)(?: "([^"]*)" "(.*)")?\s*$'
)

_APACHE_TS_FMT = "dd/MMM/yyyy:HH:mm:ss Z"


def parse_apache_combined(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse Apache combined-format lines into typed columns (T9).

    Lines that do not match yield all-null extracted fields but keep
    ``_raw`` — callers route null-ts rows to the dead-letter sink (K3)
    rather than poisoning the batch (a documented improvement over the
    reference transformer, which would throw).
    """
    line = F.col(line_col)

    def grp(n: int) -> Column:
        return F.nullif(F.regexp_extract(line, APACHE_COMBINED_RE, n), F.lit(""))

    passthrough = [c for c in df.columns if c != line_col]
    return df.select(
        *passthrough,
        grp(1).alias("client_ip"),
        grp(2).alias("identd"),
        grp(3).alias("user"),
        F.to_timestamp(grp(4), _APACHE_TS_FMT).alias("ts"),
        grp(5).alias("method"),
        grp(6).alias("path"),
        grp(7).alias("protocol"),
        grp(8).cast("int").alias("status"),
        # '-' means no bytes; cast of '-' yields null which is correct
        F.when(grp(9) == "-", F.lit(None)).otherwise(grp(9)).cast("long").alias("bytes"),
        grp(10).alias("referer"),
        grp(11).alias("user_agent"),
        line.alias("_raw"),
    )


def parse_lambda_record_line(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Split a tab-separated Lambda function-log line (T10) into
    ``log_ts, request_id, level, log_message`` columns."""
    parts = F.split(F.col(record_col), "\t")
    return df.withColumns(
        {
            "log_ts": F.to_timestamp(parts.getItem(0)),
            "request_id": parts.getItem(1),
            "level": parts.getItem(2),
            "log_message": F.trim(parts.getItem(3)),
        }
    )
