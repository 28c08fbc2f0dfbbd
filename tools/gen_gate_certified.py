"""Regenerate catalog.GATE_CERTIFIED from the driver's correctness
ledgers: a name is certified iff at least one CORRECTNESS_r*.json row
has rows_match, schema_match and hash_match all true with no err.
Prints the set literal; paste (or diff) into catalog.py each round.

Round-5 lesson: hand-maintaining the set let two never-green entries
(q07b_approx_distinct, q06c_approx_percentiles — their only rows were
``err: no_oracle``) slip in and get wrongly retired from rotation.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def green_union() -> set[str]:
    green: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green.add(name)
    return green


if __name__ == "__main__":
    names = sorted(green_union())
    print("GATE_CERTIFIED: set[str] = {")
    line = "    "
    for n in names:
        tok = f'"{n}", '
        if len(line) + len(tok) > 76:
            print(line.rstrip())
            line = "    "
        line += tok
    print(line.rstrip().rstrip(",""") + ",")
    print("}")
