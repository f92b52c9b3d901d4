"""Layer-resolved mechanism probe for the token-filter parity tail.

Round 3 ended with the worst certification cell (s3 ring: 2.59% gt-metric
gap at 2:0.25) labeled "seed-idiosyncratic" on correlational evidence
alone. This probe localizes the drift mechanistically on that cell:

1. LAYER-RESOLVED DRIFT: re-runs the backbone exactly (f32, all tokens)
   and filtered (2:0.25 drop + fused context token, guided keep-weights),
   capturing the stream after every block; reports per-layer relative L2
   drift of the CLS row and of the kept tokens — WHERE in depth the
   computation-on-a-subsample diverges.

2. COMPONENT SUBSTITUTION at the final hidden state: the filtered
   [B, 1+N, D] output differs from exact in three places — the CLS row,
   the kept-token rows (computed on the subsample), and the dropped rows
   (frozen at filter-point values). Each hybrid stream (exact component X
   + filtered rest) runs through the full cognitive pipeline via
   CognitiveAimModel.apply(precomputed_hs=...); whichever substitution
   restores the gt gap to <=1% carries the tail.

3. RING-STATISTIC CARRIER: per-image correlation between the filtered
   path's depth error increase and the ring-law statistic (mean luminance
   over the 8/9 border of the image) — does the tail load on exactly the
   global aggregate the law reads?

    python scripts/probe_tail_mechanism.py \
        --checkpoint /tmp/delta_sweep_ckpts_518/s3_ring_400_i518.npz \
        [--image-size 518] [--n 32] [--law ring] [--out /tmp/tail_probe.json]

Answers round-3 verdict item 3; results land in docs/PERF.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, required=True)
    ap.add_argument("--image-size", type=int, default=518)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--law", type=str, default="ring")
    ap.add_argument("--filter-layer", type=int, default=2)
    ap.add_argument("--keep", type=float, default=0.25)
    ap.add_argument("--out", type=str, default="/tmp/tail_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from policy_delta import synth_images
    from train_synth_ckpt import LAWS

    from cognitive_aim_tpu.api import unflatten_npz
    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from cognitive_aim_tpu.models import guidance as G
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig
    from cognitive_aim_tpu.nn import dinov2 as D
    from cognitive_aim_tpu.nn import layers as L
    from cognitive_aim_tpu.nn.dinov2 import BASE

    S = args.image_size
    cfg = BASE
    params = jax.device_put(unflatten_npz(np.load(args.checkpoint)))
    bb = params["backbone"]

    if args.law in ("proc", "procg"):
        # round-4 concentrated-regime collapse: same generator + EVAL_SEED
        # as the delta_procg_* grids, gt is a scene parameter
        from procedural_scenes import gen_procedural

        imgs01, gt = gen_procedural(args.n, S, 12345)
        gt = gt.astype(np.float64)
    else:
        imgs01 = synth_images(args.n, S, 12345)  # delta_sweep's EVAL_SEED
        gt = LAWS[args.law](imgs01).astype(np.float64)
    norm = ((imgs01 - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)
    batches = [jnp.asarray(norm[s:s + args.batch])
               for s in range(0, args.n, args.batch)]

    gh = S // cfg.patch_size
    P = gh * gh
    k_keep = max(1, int(round(args.keep * P)))
    FL = args.filter_layer

    # ------------------------------------------------- probe forward fns ----
    def probe_fwd(bbp, images, keep_w):
        """Runs BOTH paths with per-layer drift computed in-graph (host
        fetches through the relay are the sync bottleneck — only small
        arrays leave the device). Mirrors dinov2.apply's single-stage
        drop+fuse semantics (nn/dinov2.py:922-1004). Returns
        (drift_cls [L], drift_kept [L], hs_e, hs_f, idx)."""
        x0 = D._embed(bbp, images, cfg, jnp.float32)
        L_n = cfg.num_layers
        lp = [jax.tree.map(lambda a, i=i: a[i], bbp["layers"])
              for i in range(L_n)]

        # exact path (keep per-layer snapshots inside the trace)
        xs_e = []
        x = x0
        for i in range(L_n):
            x = D._block(lp[i], x, cfg, "xla")
            xs_e.append(x)
        hs_e = L.layernorm_apply(bbp["final_norm"], x, cfg.layer_norm_eps)

        # filtered path
        x = x0
        drift_cls, drift_kept = [], []

        def _rel(a, b):
            return (jnp.linalg.norm(a - b, axis=-1)
                    / (jnp.linalg.norm(b, axis=-1) + 1e-9)).mean()

        for i in range(FL):
            x = D._block(lp[i], x, cfg, "xla")
            drift_cls.append(_rel(x[:, 0], xs_e[i][:, 0]))
            drift_kept.append(jnp.asarray(0.0))
        imp = D._cls_importance(lp[FL], x, cfg)
        x_full = x
        x, idx = D._filter_tokens(x, imp, keep_w, k_keep, fuse=True)
        for i in range(FL, L_n):
            x = D._block(lp[i], x, cfg, "xla")
            drift_cls.append(_rel(x[:, 0], xs_e[i][:, 0]))
            kept_e = jnp.take_along_axis(
                xs_e[i][:, 1:], idx[..., None], axis=1)
            drift_kept.append(_rel(x[:, 1:1 + k_keep], kept_e))
        hs_f = L.layernorm_apply(
            bbp["final_norm"],
            D._scatter_tokens(x_full, x, idx), cfg.layer_norm_eps)
        return (jnp.stack(drift_cls), jnp.stack(drift_kept),
                hs_e, hs_f, idx)

    probe_fwd_j = jax.jit(probe_fwd)

    def make_hybrids(hs_e, hs_f, idx):
        """All hybrid streams, built on-device."""
        B = hs_e.shape[0]
        brow = jnp.arange(B)[:, None]
        kept_mask = jnp.zeros((B, P)).at[brow, idx].set(1.0)
        m3 = kept_mask[..., None]
        h_cls = jnp.concatenate([hs_e[:, :1], hs_f[:, 1:]], axis=1)
        h_kept = jnp.concatenate(
            [hs_f[:, :1], hs_e[:, 1:] * m3 + hs_f[:, 1:] * (1 - m3)],
            axis=1)
        h_drop = jnp.concatenate(
            [hs_f[:, :1], hs_f[:, 1:] * m3 + hs_e[:, 1:] * (1 - m3)],
            axis=1)
        dmean = ((hs_e[:, 1:] * (1 - m3)).sum(1, keepdims=True)
                 / jnp.maximum((1 - m3).sum(1, keepdims=True), 1.0))
        h_dmean = jnp.concatenate(
            [hs_f[:, :1],
             hs_f[:, 1:] * m3 + jnp.broadcast_to(
                 dmean, hs_f[:, 1:].shape) * (1 - m3)],
            axis=1)
        return h_cls, h_kept, h_drop, h_dmean

    make_hybrids_j = jax.jit(make_hybrids)

    arch = ModelArchConfig(num_iterations=6, image_size=S,
                           freeze_backbone=False, use_lora=False)
    model = CognitiveAimModel(arch)  # f32 policy, xla attention

    # normalized exif, matching the cells' training constants (the model
    # contract is raw/200, raw/22, raw/6400 — io/exif.py)
    exif_B = {
        "camera_idx": jnp.zeros(args.batch, jnp.int32),
        "focal_length": jnp.full(args.batch, 0.25),
        "aperture": jnp.full(args.batch, 0.127),
        "iso": jnp.full(args.batch, 0.016),
    }
    key = jax.random.PRNGKey(0)
    from cognitive_aim_tpu.core.rng import NoiseMode

    down = jax.jit(lambda p, x, hs, g: model.apply(
        p, x, exif_B, guidance=g, rng=key, noise_mode=NoiseMode.ZEROS,
        precomputed_hs=hs))

    # fidelity anchors: full-model exact + filtered forwards via the
    # production path (token_filter config) for cross-checking the probe
    fast_model = CognitiveAimModel(
        ModelArchConfig(num_iterations=6, image_size=S,
                        freeze_backbone=False, use_lora=False,
                        token_filter_layer=FL, token_filter_keep=args.keep))
    prod_fast = jax.jit(lambda p, x, g: fast_model.apply(
        p, x, exif_B, guidance=g, rng=key, noise_mode=NoiseMode.ZEROS))

    # ----------------------------------------------------- per-instruction --
    results = {"per_instruction": {}, "checkpoint": args.checkpoint,
               "spec": f"{FL}:{args.keep}", "law": args.law}
    mask_tab = np.asarray(G.mask_table(gh, P))

    hybrids = ("exact", "filtered", "prod_fast", "h_cls", "h_kept",
               "h_dropped", "h_dropped_mean")
    for gi, gname in enumerate(G.INSTRUCTIONS):
        gvec = jnp.full(args.batch, gi, jnp.int32)
        keep_w = jnp.broadcast_to(
            jnp.asarray(mask_tab[gi])[None], (args.batch, P)
        ).astype(jnp.float32)
        depths = {h: [] for h in hybrids}
        drift_cls = []
        drift_kept = []
        for xb in batches:
            dc, dk, hs_e, hs_f, idx = probe_fwd_j(bb, xb, keep_w)
            drift_cls.append(dc)
            drift_kept.append(dk)
            h_cls, h_kept, h_drop, h_dmean = make_hybrids_j(hs_e, hs_f, idx)
            for name, hs in (("exact", hs_e), ("filtered", hs_f),
                             ("h_cls", h_cls), ("h_kept", h_kept),
                             ("h_dropped", h_drop),
                             ("h_dropped_mean", h_dmean)):
                depths[name].append(down(params, xb, hs, gvec).depth[:, 0])
            depths["prod_fast"].append(prod_fast(params, xb, gvec).depth[:, 0])
        drift_cls = [np.asarray(d) for d in drift_cls]
        drift_kept = [np.asarray(d) for d in drift_kept]
        dd = {h: np.asarray(jnp.concatenate(v), np.float64)
              for h, v in depths.items()}
        absrel = {h: float(np.mean(np.abs(d - gt) / np.maximum(gt, 1e-6)))
                  for h, d in dd.items()}
        gaps = {h: abs(absrel[h] - absrel["exact"]) for h in hybrids}
        # probe fidelity: reimplementation vs production filtered forward
        fid = float(np.max(np.abs(dd["filtered"] - dd["prod_fast"])
                           / np.maximum(np.abs(dd["prod_fast"]), 1e-6)))
        # ring-statistic carrier: corr(per-image |err_f|-|err_e|, ring stat)
        err_inc = (np.abs(dd["filtered"] - gt) - np.abs(dd["exact"] - gt))
        ring_stat = gt  # the law IS the border statistic (+hgrad)
        corr = float(np.corrcoef(err_inc, ring_stat)[0, 1])
        results["per_instruction"][gname] = {
            "absrel": absrel, "gt_gap": gaps, "probe_vs_prod_fidelity": fid,
            "corr_errinc_ringstat": corr,
            "drift_cls_per_layer": np.mean(drift_cls, axis=0).tolist(),
            "drift_kept_per_layer": np.mean(drift_kept, axis=0).tolist(),
        }
        print(f"{gname:>13s}: gap filtered {gaps['filtered']*100:.2f}% | "
              f"h_cls {gaps['h_cls']*100:.2f}% | h_kept "
              f"{gaps['h_kept']*100:.2f}% | h_drop "
              f"{gaps['h_dropped']*100:.2f}% | h_dropmean "
              f"{gaps['h_dropped_mean']*100:.2f}% | fid {fid*100:.3f}% | "
              f"corr {corr:+.2f}", flush=True)

    worst = max(results["per_instruction"],
                key=lambda g: results["per_instruction"][g]["gt_gap"]["filtered"])
    w = results["per_instruction"][worst]
    results["worst_instruction"] = worst
    print(f"\nworst instruction: {worst} "
          f"(filtered gap {w['gt_gap']['filtered']*100:.2f}%)")
    print("CLS drift by layer:",
          " ".join(f"{v*100:.1f}" for v in w["drift_cls_per_layer"]))
    print("kept drift by layer:",
          " ".join(f"{v*100:.1f}" for v in w["drift_kept_per_layer"]))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
