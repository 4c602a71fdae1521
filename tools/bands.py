#!/usr/bin/env python3
"""Regenerate BENCH_BANDS.json (per-SF clean per-gate reference seconds)
from a verified-clean BENCH_LOCAL.json run.

Usage: python3 tools/bands.py <bench_local.json> [--merge]

Policy: only ingest a run whose telemetry is quiet (max per-gate
steal <= 0.5% unless --force); gates present in the run OVERWRITE the
band (bands track the latest verified-clean observation, not a lucky
historical minimum); gates absent from the run are kept. Bench reads
this file, never writes it. Dev tool only."""
import json, sys, os

BANDS = os.path.join(os.path.dirname(__file__), "..", "BENCH_BANDS.json")

def main():
    src = sys.argv[1]
    force = "--force" in sys.argv
    run = json.load(open(src))
    sf = run["sf"].rstrip("/").split("/")[-1]
    tel = run.get("telemetry", {})
    hot = {k: v["steal_pct"] for k, v in tel.items()
           if v.get("steal_pct", 0) > 0.5}
    if hot and not force:
        sys.exit(f"refusing: {len(hot)} gates with steal>0.5% ({sorted(hot)[:5]}...); "
                 f"re-run on a quiet host or pass --force")
    wq = run.get("window_quality")
    if wq not in (None, "clean") and not force:
        sys.exit(f"refusing: window_quality={wq}; pass --force to ingest anyway")
    bands = json.load(open(BANDS)) if os.path.exists(BANDS) else {}
    cur = bands.setdefault(sf, {})
    n = 0
    for k, v in run["queries"].items():
        if v is not None:
            cur[k] = v
            n += 1
    json.dump(bands, open(BANDS, "w"), indent=1, sort_keys=True)
    print(f"updated {n} bands for {sf} -> {BANDS}")

if __name__ == "__main__":
    main()
