#!/usr/bin/env python
"""Aggregate all multi-seed protocol sweeps into one per-scenario table.

Reads every results/repeat_*.json written by scripts/repeat.py (the
reference's repeat_test.py protocol, seeds 1..50), merges sweeps that cover
different seed ranges of the same scenario (later files win on per-seed
collisions, matching how re-runs supersede earlier arms), and prints a
markdown table plus a JSON block. This is the generator for the scenario
table in README.md / RESULTS.md — regenerate instead of hand-editing.

Usage: python scripts/summarize_results.py [--json]
"""

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A/B arms that must not merge into the canonical scenario row. Newer
# artifacts carry the arm in the JSON ("extra_flags"); these filename markers
# cover artifacts written before repeat.py recorded it (and env-var arms,
# which never appear in flags).
AB_ARM_MARKERS = {
    "legacyvar": "MCPILCO_LEGACY_VAR=1",
    "cap2": "--delta-cap=2.0",
}


def arm_label(path, rec):
    flags = [f for f in rec.get("extra_flags", []) if f != "--smoke"]
    flags += rec.get("scenario_kw", [])
    if flags:
        return " ".join(flags)
    for marker, label in AB_ARM_MARKERS.items():
        if marker in os.path.basename(path):
            return label
    return ""


def merge(files):
    """Merge sweep artifacts per (scenario, arm): per-seed dicts, later wins."""
    runs = {}
    for path in sorted(files, key=os.path.getmtime):
        with open(path) as f:
            rec = json.load(f)
        if "per_seed" not in rec:
            continue
        key = (rec["scenario"], arm_label(path, rec))
        entry = runs.setdefault(
            key, {"per_seed": {}, "per_seed_cost": {}, "files": []})
        entry["per_seed"].update(rec["per_seed"])
        entry["per_seed_cost"].update(rec.get("per_seed_cost", {}))
        entry["files"].append(os.path.relpath(path, REPO))
    return runs


def quartiles(costs):
    if not costs:
        return None
    arr = np.asarray(sorted(costs), np.float64)
    return {
        "q25": round(float(np.percentile(arr, 25)), 3),
        "median": round(float(np.percentile(arr, 50)), 3),
        "q75": round(float(np.percentile(arr, 75)), 3),
        "min": round(float(arr.min()), 3),
        "max": round(float(arr.max()), 3),
    }


def main():
    files = glob.glob(os.path.join(REPO, "results", "repeat_*.json"))
    runs = merge(files)
    rows = []
    for (scenario, tag), e in sorted(runs.items()):
        outcomes = {int(k): bool(v) for k, v in e["per_seed"].items()
                    if v is not None}
        n = len(outcomes)
        wins = sum(outcomes.values())
        costs = [v for k, v in e["per_seed_cost"].items()
                 if v is not None and outcomes.get(int(k)) is not None]
        rows.append({
            "scenario": scenario + (f" [{tag}]" if tag else ""),
            "seeds": n,
            "successes": wins,
            "rate": round(wins / n, 3) if n else None,
            "cost_quartiles": quartiles(costs),
            "artifacts": e["files"],
        })
    if "--json" in sys.argv[1:]:
        print(json.dumps(rows, indent=1))
        return
    print("| Scenario | Seeds | Success | Cost q25/med/q75 | Artifacts |")
    print("|---|---|---|---|---|")
    for r in rows:
        q = r["cost_quartiles"]
        qs = f"{q['q25']} / {q['median']} / {q['q75']}" if q else "—"
        print(f"| {r['scenario']} | {r['seeds']} | {r['successes']}/{r['seeds']}"
              f" ({100 * r['rate']:.0f}%) | {qs} | {', '.join(r['artifacts'])} |")


if __name__ == "__main__":
    main()
