"""Multi-seed, multi-law worst-case delta sweep for the token filter.

The round-2 trained-weights validation was one synthetic depth law, one
seed — and a longer finetune REGRESSED the worst delta (docs/PERF.md), so
a single run can't carry the 1%-budget argument. This sweep trains the
full model (backbone unfrozen) on a GRID of (seed x depth law), then for
each trained checkpoint measures the worst-instruction depth AbsRel of
each candidate token-filter operating point against the same-weights f32
exact path, and reports the MAX over runs — the number docs/PERF.md cites.

    python scripts/delta_sweep.py \
        [--seeds 0,1,2] [--laws center,ring] [--steps 400] \
        [--filters "2:0.25;2:0.35;1:0.5,3:0.35,5:0.25"] \
        [--image-size 224] [--out /tmp/delta_sweep.json]

One process end-to-end: the train step and every engine graph compile
once and are reused across all checkpoints (only params change).
Runs on the TPU; ~12 min per grid cell at the defaults.
"""

import argparse
import gc
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from policy_delta import synth_images  # noqa: E402
from procedural_scenes import (  # noqa: E402
    gen_procedural,
    gen_procedural_aimed,
)
from train_synth_ckpt import LAWS, run_training, stage_batches  # noqa: E402

EVAL_SEED = 12345  # eval images fixed across runs for comparability


def _run_cells_in_subprocesses(args):
    """Re-invoke this script once per (seed, law) cell and merge outputs.

    Each cell pays its own jit compile (the per-cell checkpoint cache in
    --ckpt-dir makes re-runs cheap) but the host RSS resets between cells,
    so grids of any size fit this 1-core/limited-RAM box."""
    import subprocess

    seeds = args.seeds.split(",")
    laws = args.laws.split(",")
    runs = []
    # forward argv minus the flags this wrapper overrides per cell
    argv, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a in ("--seeds", "--laws", "--out"):
            skip = True
            continue
        if a == "--cell-subprocess" or a.startswith(
                ("--seeds=", "--laws=", "--out=")):
            continue
        argv.append(a)
    for seed, law in itertools.product(seeds, laws):
        cell_out = f"{args.out}.s{seed}_{law}.json"
        cmd = [sys.executable, os.path.abspath(__file__), *argv,
               "--seeds", seed, "--laws", law, "--out", cell_out]
        print(f"=== subprocess cell seed={seed} law={law} ===", flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"  cell FAILED (rc={rc}) — continuing", flush=True)
            continue
        with open(cell_out) as f:
            runs.extend(json.load(f)["runs"])
        with open(args.out, "w") as f:
            json.dump({"runs": runs}, f, indent=1)
    specs = [s for s in args.filters.split(";") if s]
    print(f"\n=== worst-case over {len(runs)} subprocess cells ===")
    for spec in specs:
        vals = [max(r["table"][spec].values()) for r in runs
                if spec in r.get("table", {})]
        if vals:
            worst = max(vals)
            print(f"  {spec:>24s}: max worst-instruction AbsRel "
                  f"{worst * 100:.3f}%  "
                  f"{'WITHIN' if worst < 0.01 else 'EXCEEDS'} 1% budget")
    print(f"wrote {args.out}")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=str, default="0,1,2")
    ap.add_argument("--laws", type=str, default="center,ring")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--eval-size", type=int, default=0,
                    help="measure deltas at this resolution (0 = same as "
                         "--image-size). Training stays at --image-size; "
                         "the interpolated position embedding makes the "
                         "trained weights valid at both, so the delta can "
                         "be measured at the 518 operating point without "
                         "training there.")
    ap.add_argument("--n-train", type=int, default=512)
    ap.add_argument("--n-eval", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--filters", type=str,
                    default="2:0.25;2:0.35;1:0.5,3:0.35,5:0.25")
    ap.add_argument("--train-filter", type=str, default="",
                    help="train WITH this token-filter schedule active "
                         "(EViT-style filter-aware finetuning: attention "
                         "learns to survive the drop, which is the "
                         "deployment regime if the filter is on in "
                         "production). Checkpoints are cached under a "
                         "spec-suffixed name.")
    ap.add_argument("--train-filter-mode", type=str, default="always",
                    choices=["always", "alternate"],
                    help="'always' keeps the --train-filter active on every "
                         "step; 'alternate' interleaves filtered and exact "
                         "steps (sandwich-style) so the weights stay native "
                         "to BOTH paths — always-on training specializes to "
                         "filtered features and the exact path goes "
                         "off-distribution (measured, docs/PERF.md)")
    ap.add_argument("--train-guided", action="store_true",
                    help="sample a random guidance instruction per sample "
                         "per train step (with --train-filter this matches "
                         "the train-time kept-set distribution to the "
                         "guidance-conditioned eval-time one — the round-3 "
                         "unguided filter-aware grid regressed ring cells "
                         "because it trained on a single unguided kept set)")
    ap.add_argument("--adapter-rank", type=int, default=0,
                    help="measure the adapter-gated sandwich: checkpoints "
                         "carry an _ad<rank> suffix (produced by "
                         "pretrain_procedural.py --adapter-rank) and every "
                         "FILTERED variant runs with use_lora adapters "
                         "active while the f32 exact reference keeps "
                         "use_lora=False — i.e. the exact path IS the "
                         "original frozen base weights, so the reported "
                         "gt-gap is the full deployment delta vs the "
                         "original checkpoint (VERDICT r4 item 1)")
    ap.add_argument("--adapter-heads", action="store_true",
                    help="sandwich v2: checkpoints carry an _adh<rank> "
                         "suffix and a filterpath/ overlay of non-backbone "
                         "tensors; filtered variants measure the overlay "
                         "applied + adapters folded, the exact f32 path "
                         "keeps the original tensors (still the full "
                         "deployment delta vs the original checkpoint)")
    ap.add_argument("--adapter-targets", type=str,
                    default="qkv,attn_out,fc1,fc2")
    ap.add_argument("--adapter-alpha", type=int, default=0,
                    help="0 = rank (scaling 1), matching the trainer")
    ap.add_argument("--exact-from", type=str, default="",
                    help="load the f32 EXACT reference params from this "
                         "checkpoint instead of the cell's own: measures "
                         "the ASSEMBLED deployment delta of a full-weight "
                         "sandwich (sandwiched+filtered vs ORIGINAL exact, "
                         "the number VERDICT r4 said was never put "
                         "together). Point it at the original pretrain "
                         "npz the sandwich started from.")
    ap.add_argument("--out", type=str, default="/tmp/delta_sweep.json")
    ap.add_argument("--layers", type=int, default=0,
                    help="override backbone depth (0 = full ViT-B); with "
                         "--tiny also shrinks width for CPU smoke tests")
    ap.add_argument("--backbone", type=str, default="base",
                    choices=["base", "large"],
                    help="'large' measures the ViT-L path (checkpoints "
                         "carry pretrain_procedural's _L suffix)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--ckpt-dir", type=str, default="/tmp/delta_sweep_ckpts",
                    help="save each cell's trained params here; with "
                         "--measure-only, load instead of retraining "
                         "(skips the ~20 min train-step compile)")
    ap.add_argument("--measure-only", action="store_true")
    ap.add_argument("--include-unguided", action="store_true",
                    help="also measure the unguided (guidance=None) path "
                         "as a pseudo-instruction 'unguided' — the other "
                         "half of the API surface. Off by default to keep "
                         "older grid JSONs comparable.")
    ap.add_argument("--eval-on-train", action="store_true",
                    help="evaluate on the first n_eval TRAIN images of "
                         "each cell (in-sample parity; see build_eval)")
    ap.add_argument("--cell-subprocess", action="store_true",
                    help="run each (seed, law) cell in its own subprocess "
                         "and merge the per-cell JSONs — bounds the ~5-6 GB "
                         "per-cell host-RSS growth (relay client buffers "
                         "per compiled graph) at the cost of recompiling "
                         "per cell")
    args = ap.parse_args()

    if args.cell_subprocess:
        return _run_cells_in_subprocesses(args)

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.core.precision import policy_from_name
    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from cognitive_aim_tpu.models import guidance as G
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import (
        ModelArchConfig,
        parse_token_filter,
    )
    from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

    seeds = [int(s) for s in args.seeds.split(",")]
    laws = args.laws.split(",")
    filter_specs = [s for s in args.filters.split(";") if s]

    vit = None
    if args.layers or args.tiny:
        import dataclasses

        from cognitive_aim_tpu.nn.dinov2 import BASE

        kw = {"num_layers": args.layers or BASE.num_layers}
        if args.tiny:
            kw.update(hidden_size=64, num_heads=4,
                      pretrain_image_size=args.image_size)
        vit = dataclasses.replace(BASE, **kw)

    # one model/trainer pair, params swapped per run (keeps compiles warm)
    tf_kw = parse_token_filter(args.train_filter)
    if tf_kw:
        tf_kw["token_filter_train"] = True  # keep the filter ON in train
    arch = ModelArchConfig(num_iterations=6, image_size=args.image_size,
                           freeze_backbone=False, use_lora=False,
                           backbone_size=args.backbone, **tf_kw)
    model = CognitiveAimModel(arch, attn_impl="pallas_packed", vit_cfg=vit)
    alt_model = None
    if tf_kw and args.train_filter_mode == "alternate":
        alt_arch = ModelArchConfig(num_iterations=6,
                                   image_size=args.image_size,
                                   freeze_backbone=False, use_lora=False,
                                   backbone_size=args.backbone)
        alt_model = CognitiveAimModel(alt_arch, attn_impl="pallas_packed",
                                      vit_cfg=vit)
    trainer = None
    if not args.measure_only:
        tcfg = TrainConfig(epochs=1, batch_size=args.batch,
                           steps_per_epoch=args.steps, learning_rate=args.lr,
                           freeze_backbone=False,
                           guided_training=args.train_guided)
        trainer = Trainer(model, model.init(jax.random.PRNGKey(0)), tcfg,
                          output_dir="/tmp/delta_sweep_train",
                          alt_model=alt_model)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    # measurement models: f32 exact (the reference answer) + one int8+filter
    # variant per candidate spec — all sharing the trained weights
    eval_size = args.eval_size or args.image_size
    f32_model = CognitiveAimModel(
        ModelArchConfig(num_iterations=6, image_size=eval_size,
                        freeze_backbone=False, use_lora=False,
                        backbone_size=args.backbone),
        policy=policy_from_name("f32"), attn_impl="xla", vit_cfg=vit)
    # Adapter mode measures the DEPLOYMENT graph: the trained adapters are
    # folded into the dense weights (merge_lora_params — zero runtime
    # overhead on the filtered path) and the variants run the ordinary
    # filter models on the folded tree, while the f32 exact reference runs
    # the ORIGINAL tensors (the frozen base is bit-identical to the
    # --init-from checkpoint), so the reported gt-gap IS the full
    # deployment delta vs the original weights.
    variants = {}
    for spec in filter_specs:
        va = ModelArchConfig(num_iterations=6, image_size=eval_size,
                             freeze_backbone=False, use_lora=False,
                             backbone_size=args.backbone,
                             **parse_token_filter(spec))
        variants[spec] = CognitiveAimModel(
            va, policy=policy_from_name("int8"), attn_impl="pallas_packed",
            vit_cfg=vit)

    EB = args.eval_batch

    def build_eval(seed):
        """Eval images + staged device batches. With --eval-on-train the
        images are the first n_eval TRAINING images of the cell's seed
        (synth_images streams per image, so the prefix is identical):
        in-sample parity — the right proxy when the from-scratch synthetic
        model memorizes rather than generalizes (held-out gt AbsRel ~36%
        at 518 even at train loss 5e-4, so held-out metric parity would
        compare two equally-unfit functions)."""
        e01 = synth_images(args.n_eval, eval_size, seed)
        norm = ((e01 - np.asarray(IMAGENET_MEAN, np.float32))
                / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)
        # upload ONCE per eval set — re-uploading 16 MB per dispatch
        # through the relay dominated the eval wall time
        dev = [jnp.asarray(norm[s:s + EB])
               for s in range(0, args.n_eval, EB)]
        return e01, dev

    eval01, eval_dev = (None, None) if args.eval_on_train \
        else build_eval(EVAL_SEED)
    eval_seed_loaded = None
    proc_eval = None  # lazy: (device batches, gt) for the 'proc' law

    def build_eval_proc(law="proc"):
        """Eval set for the procedural laws: images AND ground truth come
        from the generator (depth is a scene parameter, not a pixel
        statistic — scripts/procedural_scenes.py). For 'proca' the gt is
        [n, 9] per-instruction depths (aimed-at-target semantics)."""
        if law == "proca":
            e01, gt = gen_procedural_aimed(args.n_eval, eval_size, EVAL_SEED)
        else:
            e01, gt = gen_procedural(args.n_eval, eval_size, EVAL_SEED)
        norm = ((e01 - np.asarray(IMAGENET_MEAN, np.float32))
                / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)
        dev = [jnp.asarray(norm[s:s + EB])
               for s in range(0, args.n_eval, EB)]
        return dev, gt
    # NORMALIZED exif (model contract: io/exif.py _process_exif_for_model
    # divides raw values by 200/22/6400) and the SAME constants every cell
    # trains with (train_synth_ckpt.stage_batches, pretrain_procedural).
    # Until round 4 this passed RAW (50.0/2.8/100) — a 200x out-of-range
    # input into the EXIF prior MLP, so every δ was measured at an input
    # point off the trained manifold.
    exif = {
        "camera_idx": jnp.asarray(np.zeros(EB, np.int32)),
        "focal_length": jnp.asarray(np.full(EB, 0.25, np.float32)),
        "aperture": jnp.asarray(np.full(EB, 0.127, np.float32)),
        "iso": jnp.asarray(np.full(EB, 0.016, np.float32)),
    }
    key = jax.random.PRNGKey(0)

    from cognitive_aim_tpu.core.rng import NoiseMode

    def make_fwd(m):
        return jax.jit(lambda p, x, g: m.apply(
            p, x, exif, guidance=g, rng=key, noise_mode=NoiseMode.ZEROS))

    fwds = {"f32": make_fwd(f32_model)}
    for spec, m in variants.items():
        fwds[spec] = make_fwd(m)

    def measure(params_f32, params_int8, gt=None, ev=None):
        """-> ({spec: {instruction: absrel}} vs the f32 path,
               {name incl 'f32': {instruction: absrel vs ground truth}}).

        The first table is strict PREDICTION parity (how far the fast
        path's depths drift from the exact path's, the repo's headline δ);
        the second is METRIC parity (each path's AbsRel against the
        synthetic law's ground truth — the accuracy the user observes,
        where redistribution of error does not count as damage).

        All dispatches are queued asynchronously and each graph's outputs
        are fetched ONCE (the relay's host fetch is the sync point at
        ~15s/round-trip; per-batch fetching made the eval 25+ min/cell)."""
        gnames = list(G.INSTRUCTIONS)
        gvecs = {g: jnp.asarray(np.full(EB, i, np.int32))
                 for i, g in enumerate(gnames)}
        if args.include_unguided:
            # the other half of the API surface: guidance=None routes
            # through the zero-pad fusion path (a distinct traced graph,
            # one extra compile per engine)
            gnames.append("unguided")
            gvecs["unguided"] = None
        device_outs = {name: {} for name in fwds}
        for gname in gnames:
            for name, fwd in fwds.items():
                p = params_f32 if name == "f32" else params_int8
                outs = [fwd(p, xb, gvecs[gname]).depth[:, 0]
                        for xb in (ev if ev is not None else eval_dev)]
                device_outs[name][gname] = jnp.concatenate(outs)
        depths = {}
        for name, per in device_outs.items():
            stacked = np.asarray(
                jnp.stack([per[g] for g in gnames]), np.float64)
            depths[name] = {g: stacked[i] for i, g in enumerate(gnames)}
        table = {}
        for spec in variants:
            table[spec] = {}
            for gname in gnames:
                a, b = depths["f32"][gname], depths[spec][gname]
                table[spec][gname] = float(np.mean(
                    np.abs(b - a) / np.maximum(np.abs(a), 1e-6)))
        gt_table = None
        if gt is not None:
            gt = np.asarray(gt, np.float64)

            def _gt_col(g):
                # 'proca': [n, 9] per-instruction depths; 'unguided' is
                # scored against the 'center' column (the reference CLI's
                # default instruction, ref:demo.py:635)
                if gt.ndim == 2:
                    i = 0 if g == "unguided" else G.INSTRUCTIONS.index(g)
                    return gt[:, i]
                return gt

            gt_table = {}
            for name in depths:
                gt_table[name] = {
                    g: float(np.mean(np.abs(depths[name][g] - _gt_col(g))
                                     / np.maximum(np.abs(_gt_col(g)), 1e-6)))
                    for g in gnames
                }
        return table, gt_table

    from cognitive_aim_tpu.api import flatten_tree, unflatten_npz

    results = []
    for seed, law in itertools.product(seeds, laws):
        t0 = time.perf_counter()
        print(f"\n=== run seed={seed} law={law} ===", flush=True)
        tf_tag = ""
        if args.train_filter:
            tf_tag = "_tf" + args.train_filter.replace(":", "-") \
                .replace(",", "_").replace("@", "r")
        if args.adapter_rank and args.train_filter:
            tf_tag += ("_adh" if args.adapter_heads else "_ad") \
                      + str(args.adapter_rank)
        elif args.train_filter_mode == "alternate" and args.train_filter:
            tf_tag += "_alt"
        elif args.train_filter_mode == "always" and args.train_filter:
            tf_tag += "_fa"  # pretrain_procedural --filter-always tag
        if args.train_guided:
            tf_tag += "_g"
        if args.backbone == "large":
            tf_tag += "_L"  # pretrain_procedural's bb_tag suffix
        # image size in the name: a 224-trained and a 518-trained cell are
        # different experiments (trained-at-224 weights evaluated at 518
        # have ~30% gt AbsRel — the resolution shift, not the filter)
        ckpt = os.path.join(
            args.ckpt_dir,
            f"s{seed}_{law}_{args.steps}_i{args.image_size}{tf_tag}.npz")
        legacy = os.path.join(args.ckpt_dir,
                              f"s{seed}_{law}_{args.steps}{tf_tag}.npz")
        if not os.path.exists(ckpt) and os.path.exists(legacy) \
                and args.image_size == 224:
            ckpt = legacy  # round-3 224 grids predate the size suffix
        if os.path.exists(ckpt):
            print(f"  (loading {ckpt})", flush=True)
            trained = unflatten_npz(np.load(ckpt))
        elif args.measure_only:
            print(f"  SKIP: --measure-only but {ckpt} missing", flush=True)
            continue
        else:
            params0 = model.init(jax.random.PRNGKey(seed))
            trainer.reset_params(params0)
            if law == "proca":
                raise SystemExit(
                    "law 'proca' trains with per-sample (instruction, "
                    "label) pairs — produce the checkpoint with "
                    "scripts/pretrain_procedural.py --aimed, then run "
                    "this sweep with --measure-only")
            if law in ("proc", "procg"):
                # short procedural cells CAN train here, but the regime
                # experiment wants thousands of steps on thousands of
                # unique images — scripts/pretrain_procedural.py (u8
                # staging, --guided for 'procg') produces the checkpoint
                # this name matches
                imgs01, target = gen_procedural(
                    args.n_train, args.image_size, seed)
            else:
                imgs01 = synth_images(args.n_train, args.image_size, seed)
                target = LAWS[law](imgs01)
            norm = ((imgs01 - np.asarray(IMAGENET_MEAN, np.float32))
                    / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)
            staged = stage_batches(trainer, norm, target, args.batch)
            trained = run_training(trainer, staged, args.steps)
            trained = jax.device_get(trained)
            np.savez(ckpt, **flatten_tree(trained))
        fp_overlay = trained.pop("filterpath", None)
        if args.exact_from:
            exact_tree = unflatten_npz(np.load(args.exact_from))
            exact_tree.pop("filterpath", None)
            p_f32 = jax.device_put(exact_tree)
            del exact_tree
        else:
            p_f32 = jax.device_put(trained)
        fast_tree = trained
        if args.adapter_rank:
            if fp_overlay is not None:
                # sandwich-v2 head deltas ride only the filtered path
                fast_tree = {**trained, **fp_overlay}
            fast_tree = next(iter(variants.values())).merge_lora_params(
                fast_tree, rank=args.adapter_rank,
                alpha=args.adapter_alpha or args.adapter_rank)
        p_int8 = model.prepare_params(fast_tree)
        if law in ("proc", "procg", "proca"):
            if proc_eval is None or proc_eval[0] != law:
                proc_eval = (law, build_eval_proc(law))
            ev_local, gt = proc_eval[1]
        else:
            if args.eval_on_train and eval_seed_loaded != seed:
                eval01, eval_dev = build_eval(seed)
                eval_seed_loaded = seed
            # ground truth at the EVAL resolution: same law on eval images
            gt, ev_local = LAWS[law](eval01), None
        table, gt_table = measure(p_f32, p_int8, gt, ev=ev_local)
        del p_f32, p_int8, trained, fast_tree
        gc.collect()
        rss_gb = 0.0
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    rss_gb = int(line.split()[1]) / 1e6
        sizes = {n: fw._cache_size() for n, fw in fwds.items()}
        la = jax.live_arrays()
        la_gb = sum(a.nbytes for a in la) / 1e9
        print(f"  [mem] RSS {rss_gb:.1f} GB; jit cache sizes {sizes}; "
              f"live arrays {len(la)} ({la_gb:.1f} GB)", flush=True)
        del la
        for spec, per_instr in table.items():
            worst = max(per_instr.values())
            gt_gap = max(abs(gt_table[spec][g] - gt_table["f32"][g])
                         for g in per_instr)
            print(f"  {spec:>24s}: worst-instruction AbsRel "
                  f"{worst * 100:.3f}%  (gt-metric gap {gt_gap * 100:.3f}%)",
                  flush=True)
        results.append({"seed": seed, "law": law, "table": table,
                        "absrel_gt": gt_table,
                        "train_s": round(time.perf_counter() - t0, 1)})
        with open(args.out, "w") as f:
            json.dump({"runs": results}, f, indent=1)

    print(f"\n=== worst-case over {len(results)} runs "
          f"({len(seeds)} seeds x {len(laws)} laws, {args.steps} steps) ===")
    for spec in filter_specs:
        worst = 0.0
        worst_run = None
        for r in results:
            w = max(r["table"][spec].values())
            if w > worst:
                worst, worst_run = w, (r["seed"], r["law"])
        print(f"  {spec:>24s}: max worst-instruction AbsRel "
              f"{worst * 100:.3f}%  (seed={worst_run[0]}, law={worst_run[1]})"
              f"  {'WITHIN' if worst < 0.01 else 'EXCEEDS'} 1% budget")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
