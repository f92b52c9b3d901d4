"""Long 518² pretrain on procedural scenes — the concentrated-attention
regime, built in-environment.

Trains the full model (backbone unfrozen, same recipe as the certified
518-native grid cells: AdamW + cosine, SILog + curiosity, remat) on
`procedural_scenes.gen_procedural` data: thousands of unique multi-object
scenes whose depth label is the perspective size of a localizable target.
Unlike the 400-step memorizing cells this task GENERALIZES (held-out
AbsRel is reported every eval interval), so the backbone's CLS attention
must learn to find structure — the regime the shipping token-filter claim
assumes (docs/PERF.md "8-cell extension", conclusion 4).

Device staging is uint8 (4x smaller through the relay; /255 + ImageNet
normalization fused into the jitted step), so ~2k unique 518² images fit
HBM next to the unfrozen ViT-B training state. Random flip augmentation
(depth is flip-invariant: the target's scale doesn't change) multiplies
the effective set 4x.

    python scripts/pretrain_procedural.py --seed 0 --steps 3000 \
        [--n-images 2048] [--batch 16] [--image-size 518] \
        [--ckpt-dir /tmp/delta_sweep_ckpts_518]

The checkpoint lands at {ckpt-dir}/s{seed}_proc_{steps}_i{size}.npz —
the exact name `delta_sweep.py --measure-only --laws proc` looks for, so
the δ grid runs on these weights with the existing machinery.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from procedural_scenes import (  # noqa: E402
    gen_procedural_aimed_u8,
    gen_procedural_u8,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=518)
    ap.add_argument("--n-images", type=int, default=2048)
    ap.add_argument("--n-eval", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--ckpt-dir", type=str,
                    default="/tmp/delta_sweep_ckpts_518")
    ap.add_argument("--data-cache", type=str, default="/tmp/proc_data",
                    help="cache generated scenes here (~10 min/2k @518²)")
    ap.add_argument("--layers", type=int, default=0,
                    help="override backbone depth (0 = full ViT-B)")
    ap.add_argument("--backbone", type=str, default="base",
                    choices=["base", "large"],
                    help="'large' pretrains the ViT-L path (checkpoint "
                         "name gains a _L suffix; δ grids pass the same "
                         "--backbone to delta_sweep)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny backbone for CPU smoke tests")
    ap.add_argument("--guided", action="store_true",
                    help="guided-native pretrain: sample a random guidance "
                         "instruction per sample per step (the label — the "
                         "target's apparent size — is instruction-invariant, "
                         "so this teaches prediction ROBUSTNESS under "
                         "instruction modulation). Without it, guided "
                         "evaluation of these weights is off-distribution: "
                         "the unguided seed-0 checkpoint holds 1.74%% "
                         "held-out AbsRel unguided but ~30%% under any "
                         "instruction, which makes the guided δ grid "
                         "meaningless on unguided-trained proc weights. "
                         "Checkpoint name uses law 'procg' "
                         "(delta_sweep.py --laws procg).")
    ap.add_argument("--aimed", action="store_true",
                    help="AIMED pretrain (law 'proca'): scenes carry 3 ring "
                         "targets at different depths and the label is the "
                         "depth of the target nearest the sampled "
                         "instruction's anchor — the instruction-DEPENDENT "
                         "task matching the reference's semantics ('how far "
                         "is the thing I'm aiming at'). Instruction sampled "
                         "per sample per step inside the jitted step, label "
                         "gathered to match; flip augmentation disabled "
                         "(labels aren't flip-invariant).")
    ap.add_argument("--train-filter", type=str, default="",
                    help="filter-aware finetune: run the token filter on "
                         "EVEN steps and the exact path on ODD steps "
                         "(sandwich-style, the trainer's alt_model "
                         "mechanism) so attention learns to survive the "
                         "drop while the weights stay native to both "
                         "paths. Meant with --init-from on a concentrated "
                         "checkpoint: the deployment-realistic rescue for "
                         "the concentrated-regime filter collapse "
                         "(docs/PERF.md round-4 section). Checkpoint name "
                         "gains a _tf<spec> suffix.")
    ap.add_argument("--filter-every", type=int, default=2,
                    help="with --train-filter: run the FILTERED step once "
                         "every N steps and the exact step on the rest "
                         "(2 = the 1:1 sandwich; 4 = 1 filtered : 3 exact "
                         "— more exact steps to cut the sandwich's "
                         "exact-path quality cost). Values != 2 add an "
                         "_e<N> suffix to the checkpoint name.")
    ap.add_argument("--init-from", type=str, default="",
                    help="warm-start params from this .npz checkpoint "
                         "instead of random init (fresh optimizer state)")
    ap.add_argument("--adapter-rank", type=int, default=0,
                    help="adapter-gated sandwich: with --train-filter and "
                         "--init-from, freeze the WHOLE base model and "
                         "train only backbone LoRA adapters of this rank, "
                         "with the filter active on EVERY step. The "
                         "adapters live only on the filtered path "
                         "(use_lora gates them), so the adapter-off exact "
                         "path stays bit-identical to the --init-from "
                         "weights — the recipe cost of the full-weight "
                         "sandwich (docs/PERF.md round-4, ~1pp on the "
                         "exact path) is zero BY CONSTRUCTION. 0 = off.")
    ap.add_argument("--adapter-heads", action="store_true",
                    help="sandwich v2: with --adapter-rank, ALSO train the "
                         "non-backbone tensors (streams/fusion/heads) for "
                         "the filtered path; they are saved as a "
                         "filterpath/ overlay subtree while the main tree "
                         "keeps the ORIGINAL tensors, so the exact path is "
                         "still bit-identical to --init-from. Round-5 "
                         "measurement: backbone-only adapters plateau at "
                         "3.5-5.3% worst gt-gap — the frozen heads can't "
                         "absorb the filtered feature statistics.")
    ap.add_argument("--adapter-heads-lr", type=float, default=0.0,
                    help="with --adapter-heads: separate (gentler) lr for "
                         "the non-backbone group; 0 = same as --lr. The "
                         "zero-init adapters need a hot lr, the "
                         "pretrained heads a gentle one.")
    ap.add_argument("--adapter-targets", type=str,
                    default="qkv,attn_out,fc1,fc2",
                    help="comma list of backbone projections that carry "
                         "adapters (subset of qkv,attn_out,fc1,fc2)")
    ap.add_argument("--adapter-alpha", type=int, default=0,
                    help="LoRA alpha (0 = rank, i.e. scaling 1)")
    ap.add_argument("--filter-always", action="store_true",
                    help="full-weight finetune with the filter on EVERY "
                         "step (no alternation): the fast-replica recipe "
                         "for the TWO-checkpoint deployment, where the "
                         "finetuned weights never serve the exact path "
                         "(round-5, docs/PERF.md assembled-delta "
                         "section). Checkpoint tag _fa replaces _alt.")
    args = ap.parse_args()
    if args.filter_every < 2:
        ap.error("--filter-every must be >= 2 (1 would never run the "
                 "exact path; use --filter-always for the always-on "
                 "regime of the two-checkpoint deployment)")
    if args.aimed and args.guided:
        ap.error("--aimed and --guided are mutually exclusive "
                 "(aimed is guided-native by construction)")
    if args.adapter_rank and not (args.train_filter and args.init_from):
        ap.error("--adapter-rank needs --train-filter (the path the "
                 "adapters are gated to) and --init-from (the frozen base)")

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.api import flatten_tree
    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig
    from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

    S, B = args.image_size, args.batch
    os.makedirs(args.ckpt_dir, exist_ok=True)
    os.makedirs(args.data_cache, exist_ok=True)
    law = "proca" if args.aimed else ("procg" if args.guided else "proc")
    gen = gen_procedural_aimed_u8 if args.aimed else gen_procedural_u8
    tag = "aimed_" if args.aimed else ""
    # SAME naming scheme as delta_sweep.py builds for alternate-mode
    # train-filter cells, so `delta_sweep.py --measure-only --train-filter
    # <spec> --train-filter-mode alternate --steps <N>` finds this ckpt
    tf_tag = ""
    if args.train_filter:
        tf_tag = "_tf" + args.train_filter.replace(":", "-") \
                                          .replace(",", "_") \
                                          .replace("@", "r") + "_alt"
        if args.filter_every != 2:
            tf_tag += f"_e{args.filter_every}"
        if args.adapter_rank:
            # adapter mode replaces the alternation (the exact path is
            # frozen, so only filtered steps carry gradient signal)
            ad = "adh" if args.adapter_heads else "ad"
            tf_tag = tf_tag.replace("_alt", f"_{ad}{args.adapter_rank}")
        elif args.filter_always:
            tf_tag = tf_tag.replace("_alt", "_fa")
    bb_tag = "_L" if args.backbone == "large" else ""
    out = os.path.join(
        args.ckpt_dir,
        f"s{args.seed}_{law}_{args.steps}_i{S}{tf_tag}{bb_tag}.npz")

    # ------------------------------------------------------------- data ----
    cache = os.path.join(args.data_cache,
                         f"train_{tag}s{args.seed}_n{args.n_images}_{S}.npz")
    t0 = time.perf_counter()
    if os.path.exists(cache):
        z = np.load(cache)
        u8, depths = z["u8"], z["depths"]
    else:
        u8, depths = gen(args.n_images, S, args.seed)
        np.savez(cache, u8=u8, depths=depths)
    # held-out eval from a disjoint seed space
    ecache = os.path.join(args.data_cache,
                          f"eval_{tag}n{args.n_eval}_{S}.npz")
    if os.path.exists(ecache):
        z = np.load(ecache)
        eu8, ed = z["u8"], z["depths"]
    else:
        eu8, ed = gen(args.n_eval, S, 90000)
        np.savez(ecache, u8=eu8, depths=ed)
    print(f"data ready in {time.perf_counter() - t0:.0f}s "
          f"({args.n_images} train + {args.n_eval} eval @{S}²)", flush=True)

    # ------------------------------------------------------------ model ----
    vit = None
    if args.layers or args.tiny:
        import dataclasses

        from cognitive_aim_tpu.nn.dinov2 import BASE

        kw = {"num_layers": args.layers or BASE.num_layers}
        if args.tiny:
            kw.update(hidden_size=64, num_heads=4, pretrain_image_size=S)
        vit = dataclasses.replace(BASE, **kw)

    # same arch/recipe as the 518-native certification cells
    # (scripts/delta_sweep.py) so the only variable is the DATA REGIME.
    # With --train-filter the PRIMARY model runs the filter (kept active
    # in training via token_filter_train) and the alt model is the exact
    # path — the trainer's sandwich alternation, mirrored manually in the
    # u8 loop below.
    from cognitive_aim_tpu.models.config import parse_token_filter

    tf_kw = parse_token_filter(args.train_filter)
    if tf_kw:
        tf_kw["token_filter_train"] = True
    lora_kw = {}
    if args.adapter_rank:
        lora_kw = dict(
            use_lora=True, lora_rank=args.adapter_rank,
            lora_alpha=args.adapter_alpha or args.adapter_rank,
            lora_targets=tuple(args.adapter_targets.split(",")))
    # lora_kw overrides use_lora=True in adapter mode; plain runs stay off
    arch = ModelArchConfig(num_iterations=6, image_size=S,
                           freeze_backbone=False,
                           backbone_size=args.backbone,
                           **{"use_lora": False, **tf_kw, **lora_kw})
    model = CognitiveAimModel(arch, attn_impl="pallas_packed", vit_cfg=vit)
    alt_model = None
    if tf_kw and not args.adapter_rank and not args.filter_always:
        alt_model = CognitiveAimModel(
            ModelArchConfig(num_iterations=6, image_size=S,
                            freeze_backbone=False, use_lora=False,
                            backbone_size=args.backbone),
            attn_impl="pallas_packed", vit_cfg=vit)
    base_flat = None
    if args.init_from:
        from cognitive_aim_tpu.api import unflatten_npz

        base_flat = dict(np.load(args.init_from))
        params = unflatten_npz(base_flat)
        print(f"warm-start from {args.init_from}", flush=True)
        if args.adapter_rank:
            # graft freshly-initialized adapter tensors into the loaded
            # base tree (the base checkpoint predates the adapters)
            fresh = model.init(jax.random.PRNGKey(args.seed + 5000))
            lay = dict(params["backbone"]["layers"])
            n_new = 0
            for k2, v in fresh["backbone"]["layers"].items():
                if k2.startswith("lora") and k2 not in lay:
                    lay[k2] = v
                    n_new += 1
            params = dict(params)
            params["backbone"] = dict(params["backbone"])
            params["backbone"]["layers"] = lay
            print(f"grafted {n_new} adapter tensors "
                  f"(rank {args.adapter_rank}, "
                  f"targets {args.adapter_targets})", flush=True)
    else:
        params = model.init(jax.random.PRNGKey(args.seed))
    cfg = TrainConfig(epochs=1, batch_size=B, steps_per_epoch=args.steps,
                      learning_rate=args.lr, freeze_backbone=False,
                      guided_training=args.guided,
                      train_only_lora=bool(args.adapter_rank),
                      sandwich_heads=args.adapter_heads,
                      heads_lr=args.adapter_heads_lr)
    tr = Trainer(model, params, cfg, output_dir="/tmp/pretrain_proc_out",
                 alt_model=alt_model)

    mean = jnp.asarray(np.asarray(IMAGENET_MEAN, np.float32))
    std = jnp.asarray(np.asarray(IMAGENET_STD, np.float32))

    def _norm(x_u8):
        return ((x_u8.astype(jnp.float32) / 255.0) - mean) / std

    # u8-staged step: normalize + random flip augmentation INSIDE the jit
    # (the target's apparent size — hence the label — is flip-invariant).
    # AIMED: no flips (the label follows the instruction's anchor, which a
    # flip would swap); instruction sampled per sample per step and the
    # matching label gathered from the [B, 9] per-instruction depths.
    def make_step(step_fn):
        def step_u8(p, o, u8b, d, e, key, cur_on, kl_w):
            x = _norm(u8b)
            batch = {"images": x, "exif": e}
            if args.aimed:
                gkey, key = jax.random.split(key)
                g = jax.random.randint(gkey, (x.shape[0],), 0, 9)
                batch["guidance"] = g
                batch["depths"] = jnp.take_along_axis(
                    d, g[:, None], axis=1)[:, 0]
            else:
                fkey, key = jax.random.split(key)
                fh, fv = jax.random.bernoulli(fkey, 0.5, (2,))
                x = jnp.where(fh, x[:, :, ::-1], x)
                x = jnp.where(fv, x[:, ::-1], x)
                batch["images"] = x
                batch["depths"] = d
            return step_fn(p, o, batch, key, cur_on, kl_w)

        return jax.jit(step_u8, donate_argnums=(0, 1))

    step_u8 = make_step(tr._step_fn)
    # sandwich alternation: filtered (primary) on even steps, exact (alt)
    # on odd — same parity convention as Trainer.train_step
    step_u8_alt = make_step(tr._alt_step_fn) if alt_model else None

    # stage the full training set on device as uint8
    n_batches = args.n_images // B
    exif = {
        "camera_idx": jnp.asarray(np.zeros(B, np.int32)),
        "focal_length": jnp.asarray(np.full(B, 0.25, np.float32)),
        "aperture": jnp.asarray(np.full(B, 0.127, np.float32)),
        "iso": jnp.asarray(np.full(B, 0.016, np.float32)),
    }
    t0 = time.perf_counter()
    staged = []
    for i in range(n_batches):
        sl = slice(i * B, (i + 1) * B)
        staged.append((jnp.asarray(u8[sl]),
                       jnp.asarray(depths[sl], jnp.float32)))
    jax.block_until_ready(staged[-1][0])
    print(f"staged {n_batches} u8 batches "
          f"({args.n_images * S * S * 3 / 1e9:.1f} GB) in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    # held-out eval always scores the EXACT path (the filter is a
    # train-time regularizer here, not the eval subject)
    eval_model = alt_model if alt_model is not None else tr.model
    eval_fn = jax.jit(lambda p, x8, e, k: eval_model.apply(
        p, _norm(x8), e, rng=k))
    eb = min(args.n_eval, 16)
    eval_staged = [jnp.asarray(eu8[s:s + eb])
                   for s in range(0, args.n_eval, eb)]
    eexif = {
        "camera_idx": jnp.asarray(np.zeros(eb, np.int32)),
        "focal_length": jnp.asarray(np.full(eb, 0.25, np.float32)),
        "aperture": jnp.asarray(np.full(eb, 0.127, np.float32)),
        "iso": jnp.asarray(np.full(eb, 0.016, np.float32)),
    }

    def held_out_absrel(p):
        outs = [eval_fn(p, xb, eexif, jax.random.PRNGKey(0)).depth[:, 0]
                for xb in eval_staged]
        pred = np.asarray(jnp.concatenate(outs), np.float64)
        # aimed: the unguided path has no defined label; score against the
        # 'center' column (the reference CLI's default instruction,
        # ref:demo.py:635) as a proxy
        gt = (ed[:, 0] if ed.ndim == 2 else ed).astype(np.float64)
        return float(np.mean(np.abs(pred - gt) / np.maximum(gt, 1e-6)))

    geval_fn = jax.jit(lambda p, x8, e, k, g: eval_model.apply(
        p, _norm(x8), e, guidance=g, rng=k))

    def held_out_absrel_guided(p):
        """worst-instruction held-out AbsRel — the guided-native check.
        On unguided-trained proc weights this sits at ~30% (off-
        distribution); guided-native weights should hold it near the
        unguided number."""
        from cognitive_aim_tpu.models import guidance as G

        worst = 0.0
        for gi in range(len(G.INSTRUCTIONS)):
            gt = (ed[:, gi] if ed.ndim == 2 else ed).astype(np.float64)
            gvec = jnp.asarray(np.full(eb, gi, np.int32))
            outs = [geval_fn(p, xb, eexif, jax.random.PRNGKey(0),
                             gvec).depth[:, 0] for xb in eval_staged]
            pred = np.asarray(jnp.concatenate(outs), np.float64)
            worst = max(worst, float(np.mean(
                np.abs(pred - gt) / np.maximum(gt, 1e-6))))
        return worst

    def ckpt_flat(p):
        """Flattened host copy; in adapter mode, verify the frozen base
        never moved and then write the ORIGINAL base tensors verbatim, so
        the saved checkpoint's adapter-off exact path is bit-identical to
        --init-from by construction (not merely up to float addition
        identities like -0.0 + 0.0)."""
        flat = flatten_tree(jax.device_get(p))
        if args.adapter_rank and base_flat is not None:
            drift = 0.0
            for k2, v in base_flat.items():
                if args.adapter_heads and not k2.startswith("backbone/"):
                    # v2: trained non-backbone tensors ship as a
                    # path-gated overlay; the main tree keeps ORIGINALS
                    # so the exact path stays bit-identical to --init-from
                    flat["filterpath/" + k2] = flat[k2]
                    flat[k2] = v
                    continue
                drift = max(drift, float(np.max(np.abs(
                    np.asarray(flat[k2], np.float64)
                    - np.asarray(v, np.float64)))))
            if drift != 0.0:
                print(f"  WARNING: frozen base drifted by {drift:.3e} "
                      f"during adapter training — restoring originals",
                      flush=True)
            for k2, v in base_flat.items():
                if args.adapter_heads and not k2.startswith("backbone/"):
                    continue
                flat[k2] = v
        if args.train_filter:
            # provenance stamp (api.py _check_filter_stamp): these weights
            # are trained/sandwiched for this spec, the recipe condition
            # of the filter's parity certification
            flat["__meta__/train_filter"] = np.asarray(args.train_filter)
            if args.adapter_rank:
                flat["__meta__/adapter_rank"] = np.asarray(
                    str(args.adapter_rank))
                flat["__meta__/adapter_alpha"] = np.asarray(
                    str(args.adapter_alpha or args.adapter_rank))
                flat["__meta__/adapter_targets"] = np.asarray(
                    args.adapter_targets)
                if args.adapter_heads:
                    flat["__meta__/adapter_heads"] = np.asarray("1")
        return flat

    # ------------------------------------------------------------ train ----
    p, o = tr.params, tr.opt_state
    cur_on = jnp.asarray(True)
    kl_w = jnp.asarray(0.1, jnp.float32)
    order = np.random.RandomState(args.seed + 777).permutation(
        np.tile(np.arange(n_batches), args.steps // n_batches + 1))
    t0 = time.perf_counter()
    for step in range(args.steps):
        u8b, d = staged[order[step]]
        key = jax.random.PRNGKey(step)
        fn = (step_u8
              if step_u8_alt is None or step % args.filter_every == 0
              else step_u8_alt)
        p, o, lg = fn(p, o, u8b, d, exif, key, cur_on, kl_w)
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step}: loss={float(lg['loss']):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if (step + 1) % args.eval_every == 0 or step == args.steps - 1:
            ar = held_out_absrel(p)
            msg = (f"  held-out AbsRel @step {step + 1}: {ar * 100:.2f}% "
                   f"(memorizing 400-step cells sit at ~36%)")
            if args.guided or args.aimed:
                gar = held_out_absrel_guided(p)
                msg += f"  worst-instruction guided: {gar * 100:.2f}%"
            print(msg, flush=True)
            # periodic save (atomic rename): a multi-hour run survives a
            # host restart with at most eval_every steps lost
            flat = ckpt_flat(p)
            np.savez(out + ".tmp.npz", **flat)
            os.replace(out + ".tmp.npz", out)

    flat = ckpt_flat(p)
    np.savez(out, **flat)
    print(f"wrote {out} ({len(flat)} tensors, "
          f"{time.perf_counter() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
