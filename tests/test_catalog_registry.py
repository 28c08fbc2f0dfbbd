"""Catalog-registry guards: every registered query is documented, every
documented query is registered, and every entry satisfies the driver
contract shape — so a late-added operator can never silently miss the
correctness gate (the round-1 failure mode: 26 queries landed after the
driver snapshot with no ledger row)."""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parents[1]

# Prefixes that identify a backticked token in COVERAGE.md as a
# catalog-entry name (vs a module/function reference).
_QUERY_SHAPE = re.compile(
    r"^(q\d|tpch_|logs_|dedup_|knn_|text_|docs_|multimodal_|emb_|ann_)"
)


def test_every_registered_query_is_documented():
    doc = set(re.findall(r"`([a-z0-9_]+)`", (REPO / "COVERAGE.md").read_text()))
    missing = sorted(set(entry.queries()) - doc)
    assert not missing, f"registered but absent from COVERAGE.md: {missing}"


def test_every_documented_query_is_registered():
    doc = set(re.findall(r"`([a-z0-9_]+)`", (REPO / "COVERAGE.md").read_text()))
    qs = set(entry.queries())
    stale = sorted(t for t in doc if _QUERY_SHAPE.match(t) and t not in qs)
    assert not stale, f"documented but not registered: {stale}"


def test_oracle_entries_subset_of_queries():
    qs = set(entry.queries())
    orphans = sorted(set(entry.oracle_sql()) - qs)
    assert not orphans, f"oracle_sql without queries() entry: {orphans}"


def test_bench_queries_are_registered():
    import bench

    qs = set(entry.queries())
    missing = sorted(set(bench.BENCH_QUERIES) - qs)
    assert not missing, f"bench.py names unregistered queries: {missing}"
