"""Inspect the driver's correctness ledgers: a name is certified iff at
least one CORRECTNESS_r*.json row has rows_match, schema_match and
hash_match all true with no err.

Since round 8, catalog.GATE_CERTIFIED derives from the ledgers AT
IMPORT (catalog._ledger_green_rounds), so nothing needs pasting when
the driver writes a new ledger. The CLI below regenerates the frozen
fallback literal (catalog._GATE_CERTIFIED_FROZEN) used only in
checkouts that carry no ledger files — refresh it occasionally, e.g.
when cutting a release tree.

Round-5 lesson (why the set is pinned to the ledger at all):
hand-maintaining it let two never-green entries (q07b_approx_distinct,
q06c_approx_percentiles — their only rows were ``err: no_oracle``)
slip in and get wrongly retired from rotation.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def green_union() -> set[str]:
    return set(green_rounds())


def green_rounds() -> dict[str, int]:
    """name -> LATEST round with a fully-green driver row. The round-8
    rotation policy (catalog._build_gate_order) sorts certified entries
    by this value ascending so the longest-uncertified re-verify first.

    Kept as a thin wrapper over the package's own loader so the test
    that pins catalog.GATE_CERTIFIED to the ledger exercises the exact
    code path catalog.py uses at import."""
    import sys

    sys.path.insert(0, str(REPO))
    from unified_log_aggregation_and_analytics_spark.catalog import (
        _ledger_green_rounds,
    )

    rounds = _ledger_green_rounds()
    if rounds is None:
        raise FileNotFoundError("no CORRECTNESS_r*.json ledgers found")
    return rounds


if __name__ == "__main__":
    names = sorted(green_union())
    print("_GATE_CERTIFIED_FROZEN: set[str] = {")
    line = "    "
    for n in names:
        tok = f'"{n}", '
        if len(line) + len(tok) > 76:
            print(line.rstrip())
            line = "    "
        line += tok
    print(line.rstrip().rstrip(",""") + ",")
    print("}")
