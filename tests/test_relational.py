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
