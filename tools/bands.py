#!/usr/bin/env python3
"""Regenerate BENCH_BANDS.json (per-SF clean per-gate reference bands)
from one or more verified-clean BENCH_LOCAL.json runs.

Usage: python3 tools/bands.py <bench_local.json> [<bench_local2.json> ...]

Each gate's band is an object {"min": fastest, "median": middle, "n":
observations} pooled across ALL the provided runs — Bench's breach
trigger judges against the MEDIAN (a single lucky minimum mislabels
honest gates: r16 forensics showed a one-run band 40% under solo-warm
truth), while min stays the closest bound on true cost. Pass >= 2 runs
so the median means something; a single run degrades to min==median
and the tool says so.

Policy: only ingest runs whose telemetry is quiet (max per-gate
steal <= 0.5% and window_quality clean, unless --force); gates present
in the provided runs REPLACE their band (bands track current
verified-clean observations, not historical luck); gates absent from
every run keep their old band. Bench reads this file, never writes it.
Dev tool only."""
import json, sys, os, statistics

BANDS = os.path.join(os.path.dirname(__file__), "..", "BENCH_BANDS.json")

def main():
    force = "--force" in sys.argv
    srcs = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not srcs:
        sys.exit(__doc__)
    runs = []
    sf = None
    for src in srcs:
        run = json.load(open(src))
        run_sf = run["sf"].rstrip("/").split("/")[-1]
        if sf is None:
            sf = run_sf
        elif run_sf != sf:
            sys.exit(f"refusing: {src} is {run_sf}, first run was {sf}")
        tel = run.get("telemetry", {})
        hot = {k: v["steal_pct"] for k, v in tel.items()
               if v.get("steal_pct", 0) > 0.5}
        if hot and not force:
            sys.exit(f"refusing {src}: {len(hot)} gates with steal>0.5% "
                     f"({sorted(hot)[:5]}...); re-run quiet or pass --force")
        wq = run.get("window_quality")
        if wq not in (None, "clean") and not force:
            sys.exit(f"refusing {src}: window_quality={wq}; pass --force")
        runs.append(run)
    if len(runs) == 1:
        print("note: single run -> min==median; pass >=2 quiet runs "
              "for a meaningful median")
    pooled = {}
    for run in runs:
        for k, v in run["queries"].items():
            if v is not None:
                pooled.setdefault(k, []).append(v)
    bands = json.load(open(BANDS)) if os.path.exists(BANDS) else {}
    cur = bands.setdefault(sf, {})
    for k, obs in pooled.items():
        cur[k] = {"min": min(obs),
                  "median": round(statistics.median(obs), 3),
                  "n": len(obs)}
    json.dump(bands, open(BANDS, "w"), indent=1, sort_keys=True)
    print(f"updated {len(pooled)} bands for {sf} from {len(runs)} run(s) -> {BANDS}")

if __name__ == "__main__":
    main()
