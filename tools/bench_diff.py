"""Diff two bench JSON artifacts (BENCH_LOCAL_r*.json, or the
driver's BENCH_r*.json when untruncated) and flag movers beyond the
established host-variance band — the comparison every round's verdict
performs by hand over whatever rows survived tail-truncation.

Bands (SURVEY §6 precedent): entries >= 2 s move ±35% across rounds on
identical code (r5/r7/r9 same-host A/Bs); sub-2 s entries are noisier
still, so the default flags only >= 2 s entries beyond ±35% and any
entry beyond ±100%. A flagged mover's protocol is tools/probe_media_ab
(same-host min-of-N), not a bisect — and only if it moves TWICE.

Usage: python tools/bench_diff.py OLD.json NEW.json [--band 0.35]
   or: python tools/bench_diff.py --best OLD1.json [OLD2.json ...] NEW.json
Prints one JSON line: common/added/removed counts, per-section totals,
and the flagged movers with their ratios.

--best (r13, verdict item 1): compare NEW against the per-entry
MINIMUM across every OLD artifact — the best historical number — so a
real regression can't hide behind one noisy prior round. With min-of-3
artifacts on both sides, a flagged mover against the historical best
either names the commit that moved it or is a new variance record.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def _diff(old: dict, new: dict, band: float) -> dict:
    common = sorted(set(old) & set(new))
    movers = []
    for name in common:
        a, b = old[name], new[name]
        if not a:
            continue
        ratio = b / a
        big = max(a, b) >= 2.0 and abs(ratio - 1) > band
        huge = abs(ratio - 1) > 1.0
        if big or huge:
            movers.append(
                {"query": name, "old": a, "new": b, "ratio": round(ratio, 2)}
            )
    movers.sort(key=lambda m: abs(m["ratio"] - 1), reverse=True)
    return {
        "n_common": len(common),
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "common_total_old": round(sum(old[n] for n in common), 3),
        "common_total_new": round(sum(new[n] for n in common), 3),
        "flagged": movers,
    }


def _min_merge(arts: list[dict]) -> dict:
    """Synthetic artifact holding the per-entry minimum across
    artifacts (sections merged independently; an entry missing from
    one artifact takes the min over those that carry it)."""

    def merge_maps(maps: list[dict]) -> dict:
        out: dict[str, float] = {}
        for m in maps:
            for k, v in m.items():
                out[k] = min(out.get(k, v), v)
        return out

    merged: dict = {"queries": merge_maps([a.get("queries", {}) for a in arts])}
    scales = [a["scale"] for a in arts if "scale" in a]
    if scales:
        merged["scale"] = {"queries": merge_maps([s["queries"] for s in scales])}
        for sec in ("scale_paths", "retained_baselines"):
            secs = [s[sec]["queries"] for s in scales if sec in s]
            if secs:
                merged["scale"][sec] = {"queries": merge_maps(secs)}
    return merged


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    band = 0.35
    if "--band" in sys.argv:
        band = float(sys.argv[sys.argv.index("--band") + 1])
    if "--best" in sys.argv:
        old, new = _min_merge([_load(a) for a in args[:-1]]), _load(args[-1])
    else:
        old, new = _load(args[0]), _load(args[1])
    out = {"band": band, "headline": _diff(old["queries"], new["queries"], band)}
    if "scale" in old and "scale" in new:
        out["scale"] = _diff(
            old["scale"]["queries"], new["scale"]["queries"], band
        )
        # r12: diff the keyed sections separately when both artifacts
        # carry them (scale paths vs retained baselines), so path
        # drift is visible without the baselines' seconds drowning it.
        for sec in ("scale_paths", "retained_baselines"):
            if sec in old["scale"] and sec in new["scale"]:
                out[sec] = _diff(
                    old["scale"][sec]["queries"],
                    new["scale"][sec]["queries"],
                    band,
                )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
