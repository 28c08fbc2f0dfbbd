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


def test_oracle_backed_outputs_are_driver_canonicalizable(spark):
    """Harness-parity guard (the r9 `multimodal_features` ERR, which
    cost a ledger slot): the driver canonicalizes results with a
    pandas ``sort_values`` over every output column, which raises
    ``unhashable type`` on array/map/struct cells — so an
    oracle-backed entry whose output carries a complex-typed column
    can NEVER earn a green driver row, no matter how right its
    values are. Ban the class at registration: every oracle-backed
    entry's output schema must contain only scalar, sortable types
    (arrays belong in rows-only twins, or posexploded/hashed into
    scalars). Schema access is analysis-only — nothing executes."""
    from pyspark.sql import types as T

    qs = entry.queries()
    bad = []
    for name in entry.oracle_sql():
        schema = qs[name](spark, "/root/testdata/sf0.001").schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "oracle-backed entries with driver-uncanonicalizable (complex-typed) "
        f"output columns: {bad}"
    )


def test_bench_queries_are_registered():
    import bench

    qs = set(entry.queries())
    missing = sorted(set(bench.BENCH_QUERIES) - qs)
    assert not missing, f"bench.py names unregistered queries: {missing}"


# --- gate-window stratification ---------------------------------------
# The driver's correctness gate samples the FIRST catalog.GATE_WINDOW
# entries of queries(). These guards make ordering-based coverage
# non-fragile: if the catalog grows, a family falling out of the window
# fails the suite instead of silently losing its driver row.

from unified_log_aggregation_and_analytics_spark import catalog as _cat

# family -> at-least-these-many representatives required in the window
# (relational dropped 20→15 in round 5: the rotation policy cycles
# never-driver-sampled entries in, and only 5 of those are relational —
# the other 10 slots are certified anchors covering distinct physical
# strategies.)
_FAMILIES = {
    "relational": (re.compile(r"^(q\d|tpch_)"), 15),
    "logs": (re.compile(r"^logs_"), 3),
    "dedup": (re.compile(r"^dedup_"), 5),
    "similarity": (re.compile(r"^(knn_|ann_|emb_)"), 4),
    "text": (re.compile(r"^text_"), 3),
    "sampling": (re.compile(r"^docs_"), 3),
    "multimodal": (re.compile(r"^multimodal_"), 2),
}


def test_gate_order_names_all_registered():
    names = _cat.gate_ordered_names()  # raises KeyError on a stale name
    assert names[: len(_cat.GATE_ORDER)] == _cat.GATE_ORDER
    assert sorted(names) == sorted(_cat.QUERIES)
    assert list(entry.queries()) == names


def test_gate_window_covers_every_family():
    window = list(entry.queries())[: _cat.GATE_WINDOW]
    for family, (pat, minimum) in _FAMILIES.items():
        got = [n for n in window if pat.match(n)]
        assert len(got) >= minimum, (
            f"gate window has {len(got)} {family} entries, needs ≥{minimum}: {got}"
        )


def test_gate_window_rotates_uncertified_in():
    # Rotation policy: while oracle-backed entries exist that no prior
    # round's driver gate has certified, they must fill ≥60% of the
    # window (or all of them, if fewer remain) — so every entry earns a
    # driver-green row within ~2 rounds of landing.
    window = list(entry.queries())[: _cat.GATE_WINDOW]
    pending = [n for n in entry.oracle_sql() if n not in _cat.GATE_CERTIFIED]
    if pending:
        rotated_in = [n for n in window if n not in _cat.GATE_CERTIFIED]
        need = min(len(pending), int(0.6 * _cat.GATE_WINDOW))
        assert len(rotated_in) >= need, (
            f"window carries {len(rotated_in)} uncertified entries, needs ≥{need}"
        )


def test_gate_window_entries_carry_oracles():
    # The window is the hard evidence channel — approximate-sketch
    # rows-only entries belong outside it.
    window = list(entry.queries())[: _cat.GATE_WINDOW]
    oracles = entry.oracle_sql()
    missing = [n for n in window if n not in oracles]
    assert not missing, f"gate-window entries without oracle SQL: {missing}"


def test_bench_names_are_registered():
    """bench.py runs unattended per round — a stale name would crash
    the whole benchmark, not one entry. Every headline and scale name
    must resolve in the catalog (scale extras are callables supplied
    by bench itself)."""
    import bench

    names = set(entry.queries())
    missing = [n for n in bench.BENCH_QUERIES + bench.SCALE_QUERIES if n not in names]
    assert not missing, f"bench references unregistered queries: {missing}"
    extras = set(bench._scale_extra_queries())
    assert extras.isdisjoint(names)
    # r13: the explicit index-build rows are bench-supplied callables
    # like the scale extras — disjoint from the catalog, present in
    # BUILD_QUERIES, and eager by contract
    builds = set(bench.BUILD_QUERIES)
    assert builds == set(bench._build_extra_queries())
    assert builds.isdisjoint(names)
    assert builds <= bench.EAGER_QUERIES
    # An EAGER_QUERIES typo doesn't crash — it silently un-eagers the
    # entry, moving its construction cost OUT of the timed region (the
    # r6 docs_dsir_sample artifact). Every eager name must resolve.
    stale = sorted(bench.EAGER_QUERIES - names - extras - builds)
    assert not stale, f"EAGER_QUERIES names nothing runnable: {stale}"


def test_gate_certified_matches_ledger():
    """GATE_CERTIFIED must be EXACTLY the union of green driver rows
    (rows+schema+hash true, no err) across CORRECTNESS_r*.json — the
    round-5 bookkeeping bug put two never-green entries (their only
    rows were ``err: no_oracle``) in the set, permanently retiring
    them from rotation without a real certification."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from gen_gate_certified import green_union

    ledger = green_union()
    extra = sorted(_cat.GATE_CERTIFIED - ledger)
    stale = sorted(ledger - _cat.GATE_CERTIFIED)
    assert not extra, f"GATE_CERTIFIED entries with no green driver row: {extra}"
    assert not stale, f"green driver rows missing from GATE_CERTIFIED: {stale}"


# --- round-8 rotation policy (ledger-derived, oldest-cert-first) -------


def test_gate_certified_derives_from_ledger_files():
    """Since r8, GATE_CERTIFIED IS the ledger union computed at import —
    the set can never go stale when the driver drops a new
    CORRECTNESS_r{N}.json (the r6/r7 failure mode)."""
    rounds = _cat._ledger_green_rounds()
    assert rounds is not None, "judged tree carries ledgers"
    assert _cat.GATE_CERTIFIED == set(rounds)


def test_gate_order_policy_pending_first_then_oldest():
    """Unit-test the rotation policy on a synthetic registry: pending
    entries lead (registration order), then certified entries re-cert
    oldest-round-first, with family minimums able to pull newer
    entries in ahead of the global age order."""
    # 60 relational + 3 multimodal certified entries; 4 pending.
    oracle_backed = [f"q{i:02d}_syn" for i in range(60)] + [
        "multimodal_a",
        "multimodal_b",
        "multimodal_c",
        "q98_new",
        "tpch_new",
        "dedup_new",
        "knn_new",
    ]
    certified = set(oracle_backed[:63])
    # round number grows with registration index; multimodal newest.
    rounds = {f"q{i:02d}_syn": 1 + i // 20 for i in range(60)}
    rounds.update({"multimodal_a": 9, "multimodal_b": 9, "multimodal_c": 9})
    window = _cat._build_gate_order(oracle_backed, certified, rounds)
    assert len(window) == _cat.GATE_WINDOW
    # 1. pending first, registration order
    assert window[:4] == ["q98_new", "tpch_new", "dedup_new", "knn_new"]
    # 2. family minimum pulls the round-9 multimodal entries in even
    #    though 60 older relational entries exist
    assert {"multimodal_a", "multimodal_b"} <= set(window)
    # 3. the free slots go to the globally oldest certified entries:
    #    every certified relational entry left OUT must be at least as
    #    new as the newest relational entry kept IN.
    rel_in = [n for n in window if n.startswith("q") and n in certified]
    rel_out = [n for n in oracle_backed if n.startswith("q") and n in certified and n not in window]
    assert max(rounds[n] for n in rel_in) <= min(rounds[n] for n in rel_out)


def test_gate_window_is_the_longest_uncertified():
    """Live check: with zero pending entries (the r7 end-state), every
    certified entry excluded from the window must have a latest-green
    round >= the newest window entry of the same family (family
    minimums make cross-family comparisons invalid)."""
    rounds = _cat._ledger_green_rounds() or {}
    window = _cat.GATE_ORDER
    pending = [n for n in entry.oracle_sql() if n not in _cat.GATE_CERTIFIED]
    if pending:
        return  # mid-round state: pending-first behavior covered above
    for family, (pat, _minimum) in _FAMILIES.items():
        fam_in = [n for n in window if pat.match(n)]
        fam_out = [
            n
            for n in entry.oracle_sql()
            if pat.match(n) and n in _cat.GATE_CERTIFIED and n not in window
        ]
        if not fam_in or not fam_out:
            continue
        assert max(rounds[n] for n in fam_in) <= min(rounds[n] for n in fam_out), (
            f"{family}: window holds a newer certification than an excluded entry"
        )


def test_every_catalog_entry_benched_or_exempted():
    """Standing rule since r14 (verdict item 2, 'bench rows at
    birth'): every catalog entry must appear in bench.py's headline
    or scale sections OR carry an explicit reasoned exemption in
    bench.NOBENCH — so a new entry's drift history starts the round
    it lands, and a silent orphan fails here instead of surfacing as
    a judge finding. Also: no entry may be both benched and
    exempted, and NOBENCH must not carry stale names."""
    import bench

    import unified_log_aggregation_and_analytics_spark.catalog as C
    import unified_log_aggregation_and_analytics_spark.catalog_llm  # noqa: F401
    import unified_log_aggregation_and_analytics_spark.catalog_logs  # noqa: F401

    names = set(C.QUERIES)
    benched = set(bench.BENCH_QUERIES) | set(bench.SCALE_QUERIES)
    exempt = set(bench.NOBENCH)
    orphans = names - benched - exempt
    assert not orphans, f"catalog entries with no bench row or exemption: {sorted(orphans)}"
    both = benched & exempt
    assert not both, f"entries both benched and exempted: {sorted(both)}"
    stale = exempt - names
    assert not stale, f"NOBENCH names not in the catalog: {sorted(stale)}"
    assert all(isinstance(v, str) and v for v in bench.NOBENCH.values())
