"""Shipping fast-point (token filter 2:0.35) end-to-end block retune.

The round-4 ship switch moved the certified fast operating point from
2:0.25 to 2:0.35 (the only >=1,000 img/s spec certified on BOTH task
semantics — docs/PERF.md round-4b/4c). That spec runs 10 of 12 layers at
N=480 kept tokens, a shape none of the kernel block caps were ever tuned
for: the flash q-block picker splits 480 into 2x240 at B>8 (cap 352), and
the fused-MLP row cap stays at the full-N VMEM-derived value. This sweep
A/Bs small-N-relevant candidates END-TO-END via `bench.py --token-filter
2:0.35` in fresh subprocesses (CAIM_* knobs are read at trace time — same
methodology as scripts/bench_vitl_sweep.py; isolated kernel probes cannot
rank block sizes, round-2 lesson).

Each global override also applies to the 2 exact full-N layers, so a
candidate only ships if the NET end-to-end number wins.

    python scripts/bench_fast_sweep.py [--batch 16] \
        [--spec 2:0.35] [--out /tmp/fast_sweep.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [
    ("baseline", {}, 0),                       # default caps, default batch
    ("qb480", {"CAIM_FLASH_QB": "480"}, 0),    # one q-block at N=480
    ("mlp192", {"CAIM_MLP_NB": "192"}, 0),
    ("mlp240", {"CAIM_MLP_NB": "240"}, 0),
    ("unroll2", {"CAIM_SCAN_UNROLL": "2"}, 0),
    ("qb480_mlp192", {"CAIM_FLASH_QB": "480", "CAIM_MLP_NB": "192"}, 0),
    ("b24", {}, 24),
    ("b32", {}, 32),
]

RATE = re.compile(r"([\d.]+) img/s")


def run_point(label, env_over, batch, spec):
    env = dict(os.environ, **env_over)
    # --no-fallback: a candidate whose env knobs crash the primary config
    # must record FAILED, not the fallback path's rate under the
    # candidate's label (that skewed A/B ranking — ADVICE r4)
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--batch", str(batch), "--token-filter", spec, "--no-fallback"]
    try:
        p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=1200, cwd=ROOT)
    except subprocess.TimeoutExpired:
        print(f"  {label}: TIMEOUT (1200s) — skipping point", flush=True)
        return None
    text = p.stdout + p.stderr
    m = RATE.findall(text)
    rate = float(m[-1]) if m else None
    if rate is None:
        tail = "\n".join(text.strip().splitlines()[-4:])
        print(f"  {label}: FAILED\n{tail}", flush=True)
    else:
        print(f"  {label}: {rate} img/s", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--spec", type=str, default="2:0.35")
    ap.add_argument("--points", type=str, default="",
                    help="comma list of point labels to run (default all)")
    ap.add_argument("--env", type=str, default="",
                    help="extra point as K=V[;K=V...] (label 'custom')")
    ap.add_argument("--out", type=str, default="/tmp/fast_sweep.json")
    args = ap.parse_args()

    points = list(POINTS)
    if args.points:
        sel = set(args.points.split(","))
        points = [p for p in points if p[0] in sel]
    if args.env:
        over = dict(kv.split("=", 1) for kv in args.env.split(";"))
        points.append(("custom:" + args.env, over, 0))

    results = {}
    for label, env_over, batch in points:
        results[label] = run_point(label, env_over, batch or args.batch,
                                   args.spec)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
