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


def combined_fields(line: Column) -> dict[str, Column]:
    """The combined-format extraction as a named-column bundle, so
    callers that route multiple formats in ONE pass (normalize_ec2)
    can embed the expressions in a CASE without re-scanning."""

    def grp(n: int) -> Column:
        return F.nullif(F.regexp_extract(line, APACHE_COMBINED_RE, n), F.lit(""))

    return {
        "client_ip": grp(1),
        "identd": grp(2),
        "user": grp(3),
        "ts": F.to_timestamp(grp(4), _APACHE_TS_FMT),
        "method": grp(5),
        "path": grp(6),
        "protocol": grp(7),
        "status": grp(8).cast("int"),
        # '-' means no bytes; cast of '-' yields null which is correct
        "bytes": F.when(grp(9) == "-", F.lit(None)).otherwise(grp(9)).cast("long"),
        "referer": grp(10),
        "user_agent": grp(11),
    }


def parse_apache_combined(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse Apache combined-format lines into typed columns (T9).

    Lines that do not match yield all-null extracted fields but keep
    ``_raw`` — callers route null-ts rows to the dead-letter sink (K3)
    rather than poisoning the batch (a documented improvement over the
    reference transformer, which would throw).
    """
    line = F.col(line_col)
    fields = combined_fields(line)
    passthrough = [c for c in df.columns if c != line_col]
    return df.select(
        *passthrough,
        *[v.alias(k) for k, v in fields.items()],
        line.alias("_raw"),
    )


# Apache error-log line. Covers both the 2.2 shape
#   [Wed Oct 13 14:32:52 2021] [error] [client 72.21.198.66] msg
# and the 2.4 shape
#   [Wed Oct 13 14:32:52.123456 2021] [core:error] [pid 31] [client 72.21.198.66:4753] msg
# (the reference tails error_log* into the same delivery stream as
# access_log*, lib/computes/ec2/ec2-startup.sh:46-49). Groups:
# 1 timestamp, 2 module (2.4 only), 3 level, 4 pid (2.4 only),
# 5 client, 6 message
APACHE_ERROR_RE = (
    r"^\[([^\]]+)\] \[(?:([a-z_]+):)?([a-z]+[0-9]?)\]"
    r"(?: \[pid (\d+)(?::tid \d+)?\])?"
    r"(?: \[client ([^\]]+)\])? (.*)$"
)


def error_fields(line: Column) -> dict[str, Column]:
    """The error-log extraction as a named-column bundle (see
    combined_fields for why)."""

    def grp(n: int) -> Column:
        return F.nullif(F.regexp_extract(line, APACHE_ERROR_RE, n), F.lit(""))

    ts_clean = F.regexp_replace(  # drop "Wed ", collapse "Oct  1" day pad
        F.regexp_replace(grp(1), r"^[A-Za-z]+ ", ""), r"\s+", " "
    )
    ts = F.coalesce(
        F.try_to_timestamp(ts_clean, F.lit("MMM d HH:mm:ss.SSSSSS yyyy")),
        F.try_to_timestamp(ts_clean, F.lit("MMM d HH:mm:ss yyyy")),
    )
    return {
        "ts": ts,
        "module": grp(2),
        "level": grp(3),
        "pid": grp(4).cast("long"),
        # 2.4 appends :port to the client; strip it, keep the ip
        "client_ip": F.regexp_replace(grp(5), r":\d+$", ""),
        "message": grp(6),
    }


def parse_apache_error(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse Apache error-log lines into typed columns.

    The error-log timestamp (``Wed Oct 13 14:32:52[.ffffff] 2021``) has
    no zone (httpd logs server-local time; the reference's EC2 AMI runs
    UTC) and a space-padded day-of-month; the day-of-week token is
    dropped before parsing because Java's formatter cannot parse 'EEE'.
    Non-matching lines keep ``_raw`` with null fields — same DLQ
    routing contract as parse_apache_combined.
    """
    line = F.col(line_col)
    fields = error_fields(line)
    passthrough = [c for c in df.columns if c != line_col]
    return df.select(
        *passthrough,
        *[v.alias(k) for k, v in fields.items()],
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
