"""ViT-L ("large" backbone) end-to-end block-size retune.

Round-2 lesson (docs/PERF.md): isolated kernel probes CANNOT rank block
sizes — the win lives in how the composed graph pipelines DMAs across
adjacent kernels. So this sweep A/Bs each candidate END-TO-END via
`bench.py --backbone large` in a fresh subprocess (the CAIM_* env knobs
are read at trace time, so one process can't sweep them).

Candidates target the two known ViT-L taxes:
  - flash q_block cap 256 pads N=1371 -> 1536 query rows (12% MXU tax on
    every QK^T/PV dot); 352 (4 blocks, 2.7% pad) and 288 (5 blocks, 5%)
    are the low-padding alternatives if VMEM admits them at HD=1024.
  - fused-MLP row cap 128 (the 160 the VMEM budget admits crashed the
    compiler mid-round-2; worth one retry after the kernel-chain changes).

    python scripts/bench_vitl_sweep.py [--batch 8] [--out /tmp/vitl_sweep.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# NOTE: after the round-3 retune, qb288 + mlp_nb160 ARE the ViT-L
# defaults — "baseline" already includes them. Round-4 candidates attack
# the remaining per-program overhead / shallow-DMA-pipelining gap
# (docs/PERF.md ViT-L ceiling analysis): scan unroll exposes layer-pair
# boundaries to XLA so adjacent kernels' DMAs can overlap.
POINTS = [
    # since the round-4 default flip, {} = unroll2 + flash qb352 at
    # D>=1024; "old_defaults" pins the round-3 pairing (unroll1 + qb288)
    ("baseline", {}),
    ("old_defaults", {"CAIM_SCAN_UNROLL": "1"}),
    ("unroll2", {"CAIM_SCAN_UNROLL": "2"}),
    ("unroll3", {"CAIM_SCAN_UNROLL": "3"}),
    ("unroll2_qb352", {"CAIM_SCAN_UNROLL": "2", "CAIM_FLASH_QB": "352"}),
    ("unroll2_nb192", {"CAIM_SCAN_UNROLL": "2", "CAIM_MLP_NB": "192"}),
    ("flash_qb352", {"CAIM_FLASH_QB": "352"}),
    ("qkv_nb352", {"CAIM_QKV_NB": "352"}),
]

RATE = re.compile(r"([\d.]+) img/s")


def run_point(label, env_over, batch, extra):
    env = dict(os.environ, **env_over)
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--batch", str(batch), "--backbone", "large"] + extra
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1200, cwd=ROOT)
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=str, default="",
                    help="comma list of point labels to run (default all)")
    ap.add_argument("--env", type=str, default="",
                    help="extra point as K=V[;K=V...] (label 'custom')")
    ap.add_argument("--token-filter", type=str, default="")
    ap.add_argument("--out", type=str, default="/tmp/vitl_sweep.json")
    args = ap.parse_args()

    points = list(POINTS)
    if args.points:
        sel = set(args.points.split(","))
        points = [p for p in points if p[0] in sel]
    if args.env:
        over = dict(kv.split("=", 1) for kv in args.env.split(";"))
        points.append(("custom:" + args.env, over))
    extra = []
    if args.token_filter:
        extra += ["--token-filter", args.token_filter]

    results = {}
    for label, env_over in points:
        results[label] = run_point(label, env_over, args.batch, extra)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
