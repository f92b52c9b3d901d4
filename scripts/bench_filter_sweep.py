"""Throughput sweep over token-filter schedules in ONE process.

Measures several candidate filter specs back-to-back with bench.bench()
(same chained-scan slope methodology as the headline bench), amortizing
the runtime startup across specs. Used to pick the progressive-schedule
operating points worth a full delta_sweep pass (docs/PERF.md frontier).

    python scripts/bench_filter_sweep.py \
        [--batch 16] [--size 518] [--backbone base] \
        [--specs "2:0.25;2:0.35;1:0.5,3:0.35,5:0.25"] \
        [--out /tmp/filter_sweep.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--policy", type=str, default="int8")
    ap.add_argument("--attn", type=str, default="pallas_packed")
    ap.add_argument("--backbone", type=str, default="base")
    ap.add_argument("--k-short", type=int, default=2)
    ap.add_argument("--k-long", type=int, default=10)
    ap.add_argument("--specs", type=str,
                    default="2:0.25;1:0.5,3:0.35,5:0.25")
    ap.add_argument("--out", type=str, default="/tmp/filter_sweep.json")
    args = ap.parse_args()

    results = {}
    for spec in [s for s in args.specs.split(";")]:
        label = spec or "exact"
        try:
            ips = bench.bench(args.batch, args.size, args.policy, args.attn,
                              args.k_short, args.k_long,
                              token_filter=spec, backbone=args.backbone)
            results[label] = round(ips, 1)
        except Exception as e:  # keep sweeping past a bad spec
            bench.log(f"{label} FAILED: {type(e).__name__}: {e}")
            results[label] = None
        print(json.dumps({label: results[label]}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    bench.log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
