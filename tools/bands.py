#!/usr/bin/env python3
"""Regenerate BENCH_BANDS.json (per-SF clean per-gate reference bands)
from one or more BENCH_LOCAL.json runs.

Usage: python3 tools/bands.py <bench_local.json> [<bench_local2.json> ...]

Each gate's band is an object {"min": fastest, "median": middle, "n":
observations} pooled across the provided runs — Bench's breach trigger
judges against the MEDIAN (a single lucky minimum mislabels honest
gates: r16 forensics showed a one-run band 40% under solo-warm truth),
while min stays the closest bound on true cost. Pass >= 2 runs so the
median means something; a single run degrades to min==median and the
tool says so.

Policy: quiet-gated PER OBSERVATION — a gate's timing from a run is
pooled only when that gate's own measured window showed steal <= 0.5%
and the gate did not fail. (An all-or-nothing run refusal starves
bands on a host whose co-tenant duty-cycles: r17 measured 41-of-155
gates steal-hot in an otherwise usable window. Per-gate steal can
still miss pulse contamination with ~0 steal inside the gate's own
window — that residual is why the median over several runs, not any
single observation, is the trigger.) Gate-quality labels are
deliberately NOT a filter: they are computed against the OLD bands,
and excluding 'regressed' observations would ratchet stale-low bands
down forever. Gates with pooled observations REPLACE their band; gates
quiet in no run keep their old band (listed). Bench reads this file,
never writes it. Dev tool only."""
import json, sys, os, statistics

BANDS = os.path.join(os.path.dirname(__file__), "..", "BENCH_BANDS.json")
MAX_STEAL = 0.5

def main():
    srcs = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not srcs:
        sys.exit(__doc__)
    pooled, sf, dropped = {}, None, 0
    for src in srcs:
        run = json.load(open(src))
        run_sf = run["sf"].rstrip("/").split("/")[-1]
        if sf is None:
            sf = run_sf
        elif run_sf != sf:
            sys.exit(f"refusing: {src} is {run_sf}, first run was {sf}")
        tel = run.get("telemetry", {})
        for k, v in run["queries"].items():
            if v is None:
                continue
            st = tel.get(k, {}).get("steal_pct", 0)
            if st is not None and st > MAX_STEAL:
                dropped += 1
                continue
            pooled.setdefault(k, []).append(v)
    if len(srcs) == 1:
        print("note: single run -> min==median; pass >=2 runs "
              "for a meaningful median")
    bands = json.load(open(BANDS)) if os.path.exists(BANDS) else {}
    cur = bands.setdefault(sf, {})
    for k, obs in pooled.items():
        cur[k] = {"min": min(obs),
                  "median": round(statistics.median(obs), 3),
                  "n": len(obs)}
    stale = sorted(set(cur) - set(pooled))
    json.dump(bands, open(BANDS, "w"), indent=1, sort_keys=True)
    print(f"updated {len(pooled)} bands for {sf} from {len(srcs)} run(s), "
          f"dropped {dropped} steal-hot observations -> {BANDS}")
    if stale:
        print(f"kept old bands (no quiet observation): {stale}")

if __name__ == "__main__":
    main()
