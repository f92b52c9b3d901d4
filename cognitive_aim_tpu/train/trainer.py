"""Training engine: pjit-sharded train step, optax AdamW + (warmup-)cosine,
gradient accumulation, grad-clip 1.0, TB-compatible logging, tolerant
checkpointing.

`train.py` in the reference is a *specification*, not working code
(SURVEY.md §2.4 lists the crashes: missing config keys, model-output tuple
treated as tensor, broken curiosity branch). This trainer keeps the
documented mechanics — SILog depth loss (ref:train.py:26-45), total =
depth + 0.1*curiosity after warmup (ref:150-163), clip-grad-norm 1.0
(ref:169), AdamW (ref:104-109), cosine schedule (ref:115-120), best-val
checkpointing (ref:273-286), TB scalar names Train/BatchLoss etc.
(ref:185-190, 263-266) — with the key mismatches resolved and the loop
expressed as one jitted step over a (data[, model]) mesh.

Depth target semantics: the model predicts a single scalar per image while
the dataset yields [H, W] maps; the reference would crash on the shape
mismatch (ref:train.py:148 vs [B,H,W] depths). Here the target is the
spatial mean of the valid depth map, or a provided scalar `depth_value`.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cognitive_aim_tpu.core.mesh import make_mesh
from cognitive_aim_tpu.core.rng import NoiseMode
from cognitive_aim_tpu.parallel.sharding import (
    batch_shardings,
    param_shardings,
    shard_batch,
    shard_params,
)
from cognitive_aim_tpu.train import losses as LS
from cognitive_aim_tpu.train.metrics import calculate_depth_metrics


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.015
    epochs: int = 10
    batch_size: int = 8
    accumulation_steps: int = 1
    scheduler: str = "cosine"  # cosine | warmup_cosine | step
    warmup_epochs: int = 0
    grad_clip: float = 1.0
    loss_lambda: float = 0.5
    curiosity_warmup_epochs: int = 0
    curiosity_weight: float = 0.1  # ref:train.py:163 fixed 0.1
    curiosity_loss_type: str = "robust"
    uncertainty_weight: float = 0.1
    attention_entropy_weight: float = 0.0
    # variational KL beta schedule (curiosity.variational_params — declared by
    # the shipped configs, implemented here; constant 0.1 matches the
    # reference's hardcoded weight ref:src/model.py:646)
    beta_schedule: str = "constant"
    beta_start: float = 0.1
    beta_end: float = 0.1
    log_interval: int = 10
    save_interval: int = 1
    steps_per_epoch: int = 100  # for schedule construction
    freeze_backbone: bool = True
    tensor_parallel: bool = False
    seed: int = 0
    # "sample" reproduces torch eval semantics (the reference's VAE STILL
    # samples under model.eval(), ref:src/model.py:607-610) but makes
    # best-val checkpoint selection noisy; "zeros" gives deterministic
    # validation (VERDICT r1 weak #8)
    eval_noise_mode: str = "sample"
    # Guided training: sample a uniform random guidance instruction per
    # sample per step (guidance.INSTRUCTIONS order) inside the jitted step.
    # The reference trains unguided only (ref:train.py:145 calls forward,
    # never forward_with_guidance); this is the filter-aware-finetuning
    # companion knob — with token_filter_train on, an unguided train step
    # sees ONE kept-token distribution while guided eval sees nine
    # (guidance biases the keep ranking), so the model specializes to the
    # wrong tokens (measured: docs/PERF.md 518-native grid, s0 ring
    # 0.95%->3.39% under unguided filter-aware finetuning). Randomizing the
    # instruction matches the train-time kept-set distribution to eval.
    guided_training: bool = False
    # Adapter-only training: freeze EVERY parameter except the backbone
    # LoRA tensors (lora_A/lora_B and the extended lora_<target>_A/_B).
    # The adapter-gated token-filter sandwich rides on this: the filtered
    # path trains its adapters while the base weights — hence the
    # adapter-off exact path — stay bit-identical to the originals
    # (docs/PERF.md round-5 certification).
    train_only_lora: bool = False
    # Sandwich v2: with train_only_lora, ALSO train every non-backbone
    # tensor (streams/fusion/heads/curiosity/exif). The trained copies are
    # shipped as a path-gated `filterpath/` overlay next to the untouched
    # originals (pretrain_procedural --adapter-heads), so the exact path
    # still serves the original weights bit-identically while the filtered
    # path gets heads adapted to filtered feature statistics — the part a
    # backbone-only LoRA cannot reach (round-5: backbone-only rescue
    # plateaus at 3.5-5.3% worst gt-gap; docs/PERF.md).
    sandwich_heads: bool = False
    # separate lr for the sandwich_heads ("train_heads") group; 0 = use
    # the main learning_rate/schedule. The adapters (zero-init B) need a
    # hot lr while the pretrained heads need a gentle one.
    heads_lr: float = 0.0
    # Pipeline-parallel training (GPipe): >1 shards the backbone layer
    # stack over a `pipe` mesh axis and differentiates straight through
    # the schedule (parallel/pipeline.py pipelined_scan — ppermute's
    # transpose gives the reversed backward schedule; stage chunks remat
    # in backward). Mutually exclusive with tensor_parallel and the token
    # filter; the memory option for the 24-layer `large` backbone when a
    # full DP replica of the training state doesn't fit one chip.
    pipeline_stages: int = 0
    pipeline_n_micro: int = 4
    # the logging.curiosity block the shipped configs declare but the
    # reference never implements (configs/experiment_B.yaml): attention
    # heatmap images + curiosity statistics to TensorBoard at validation
    rich_logging: bool = False
    num_save_images: int = 12

    @classmethod
    def from_raw(cls, raw: Dict[str, Any], steps_per_epoch: int = 100):
        """Accepts the shipped YAML schema with the reference's intended keys
        and tolerant fallbacks for the ones train.py reads but no YAML
        defines (ref:train.py:94 training.loss.lambda, ref:100
        model.curiosity.warmup_epochs)."""
        tr = raw.get("training", {})
        cur = raw.get("curiosity", raw.get("model", {}).get("curiosity", {})) or {}
        loss_cfg = tr.get("loss", {}) if isinstance(tr.get("loss"), dict) else {}
        logging_cfg = raw.get("logging", {})
        return cls(
            learning_rate=float(tr.get("learning_rate", 2e-5)),
            weight_decay=float(tr.get("weight_decay", 0.015)),
            epochs=int(tr.get("epochs", 10)),
            batch_size=int(tr.get("batch_size", 8)),
            accumulation_steps=int(tr.get("accumulation_steps", 1)),
            scheduler=str(tr.get("scheduler", "cosine")),
            warmup_epochs=int(tr.get("warmup_epochs", 0)),
            grad_clip=float(tr.get("grad_clip_value", 1.0)),
            loss_lambda=float(loss_cfg.get("lambda", cur.get("lambda", 0.5))),
            curiosity_warmup_epochs=int(cur.get("warmup_epochs", 0)),
            curiosity_loss_type=str(cur.get("loss_type", "robust")),
            uncertainty_weight=float(cur.get("uncertainty_weight", 0.1)),
            attention_entropy_weight=float(tr.get("attention_entropy_weight", 0.0)),
            beta_schedule=str(
                cur.get("variational_params", {}).get("beta_schedule", "constant")
            ),
            beta_start=float(
                cur.get("variational_params", {}).get("beta_start", 0.1)
            ),
            beta_end=float(cur.get("variational_params", {}).get("beta_end", 0.1)),
            log_interval=int(logging_cfg.get("log_interval", 10)),
            save_interval=int(logging_cfg.get("save_interval",
                                              tr.get("save_every", 1))),
            steps_per_epoch=steps_per_epoch,
            freeze_backbone=bool(raw.get("freeze_backbone",
                                         raw.get("model", {}).get("freeze_backbone", True))),
            eval_noise_mode=str(
                raw.get("validation", {}).get("noise_mode", "sample")
            ),
            guided_training=bool(tr.get("guided_training", False)),
            rich_logging=any(
                logging_cfg.get("curiosity", {}).get(k)
                for k in ("log_curiosity_stats", "log_attention_weights",
                          "log_exploration_history", "save_curiosity_heatmaps")
            ),
            num_save_images=int(logging_cfg.get("num_save_images", 12)),
        )


def scalar_depth_target(depths: jnp.ndarray) -> jnp.ndarray:
    """[B] per-image scalar target from [B,H,W] maps (spatial mean) or
    pass-through for [B] scalars."""
    if depths.ndim == 1:
        return depths
    return depths.reshape(depths.shape[0], -1).mean(axis=1)


class Trainer:
    def __init__(self, model, params, cfg: TrainConfig, mesh=None,
                 output_dir: str = "./outputs", writer=None, alt_model=None):
        """`alt_model`: optional second model variant (same param pytree —
        e.g. the token filter toggled off) trained on alternating steps.
        Training a filter ALWAYS-on specializes the weights to filtered
        features and the exact (unfiltered) forward goes off-distribution —
        measured: guided always-on filter training blew strict parity up to
        6.5% (docs/PERF.md round-3). Alternating keeps the weights native
        to BOTH the exact and the filtered path (sandwich-style training)."""
        self.model = model
        self.cfg = cfg
        if cfg.pipeline_stages > 1:
            if cfg.tensor_parallel:
                raise ValueError(
                    "pipeline_stages and tensor_parallel are mutually "
                    "exclusive (the pipe mesh has no `model` axis)")
            if mesh is None:
                from cognitive_aim_tpu.parallel.pipeline import (
                    make_pipeline_mesh,
                )

                mesh = make_pipeline_mesh(cfg.pipeline_stages)
            elif "pipe" not in mesh.axis_names:
                raise ValueError(
                    f"pipeline_stages={cfg.pipeline_stages} needs a mesh "
                    f"with a 'pipe' axis, got {mesh.axis_names}")
        self.mesh = mesh if mesh is not None else make_mesh()
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.writer = writer
        self.epoch = 0
        self.best_val_loss = float("inf")

        schedule = self._schedule()
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),  # ref:train.py:169
            optax.adamw(schedule, weight_decay=cfg.weight_decay,
                        b1=0.9, b2=0.999, eps=1e-8),
        )
        if cfg.train_only_lora:
            # adapters only: everything that is not a lora_* tensor gets a
            # zero update, INCLUDING heads/streams/curiosity (they are
            # shared with the adapter-off exact path, so touching them
            # would break the bit-identity of the original weights)
            def _labels_lora(p):
                def label(path, _):
                    names = [str(getattr(k, "key", getattr(k, "idx", k)))
                             for k in path]
                    if any(n.startswith("lora") for n in names):
                        return "train"
                    if cfg.sandwich_heads and names and names[0] != "backbone":
                        # v2: non-backbone tensors train too; they ship as
                        # a path-gated filterpath/ overlay, never touching
                        # the exact path's originals
                        return "train_heads"
                    return "freeze"

                return jax.tree_util.tree_map_with_path(label, p)

            # Split lr: adapters start at zero (B=0) and need a hot lr to
            # move; the overlay heads start at well-tuned values and a hot
            # lr destroys them (round-5: uniform 1e-3 left the filtered
            # path WORSE than backbone-only adapters). heads_lr=0 means
            # same as the main lr.
            heads_tx = tx
            if cfg.sandwich_heads and cfg.heads_lr > 0.0:
                heads_tx = optax.chain(
                    optax.clip_by_global_norm(cfg.grad_clip),
                    optax.adamw(cfg.heads_lr, weight_decay=cfg.weight_decay,
                                b1=0.9, b2=0.999, eps=1e-8),
                )
            tx = optax.multi_transform(
                {"train": tx, "train_heads": heads_tx,
                 "freeze": optax.set_to_zero()},
                param_labels=_labels_lora,
            )
        elif cfg.freeze_backbone:
            # freeze the backbone except LoRA adapters (ref:src/model.py:817-819
            # freezes all backbone params; LoRA params are the trainable
            # adaptation, ref:821-831)
            def _labels(p):
                def label(path, _):
                    names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
                    if names and names[0] == "backbone":
                        if any(n in ("lora_A", "lora_B") for n in names):
                            return "train"
                        return "freeze"
                    return "train"

                return jax.tree_util.tree_map_with_path(label, p)

            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, param_labels=_labels
            )
        if cfg.accumulation_steps > 1:
            tx = optax.MultiSteps(tx, cfg.accumulation_steps)
        self.tx = tx

        self.params = shard_params(self.mesh, params, cfg.tensor_parallel)
        self.opt_state = self.tx.init(self.params)
        self._step_fn = self._build_step()
        self._alt_step_fn = (
            self._build_step(alt_model) if alt_model is not None else None
        )
        eval_noise = NoiseMode(cfg.eval_noise_mode)
        self._eval_fn = jax.jit(
            lambda p, images, exif, key: self.model.apply(
                p, images, exif, rng=key, noise_mode=eval_noise
            )
        )
        self._global_step = 0

    def reset_params(self, params):
        """Swap in fresh params + optimizer state, keeping every compiled
        step (shapes unchanged -> no recompile). Lets sweep drivers train
        several checkpoints in one process (scripts/delta_sweep.py)."""
        self.params = shard_params(self.mesh, params, self.cfg.tensor_parallel)
        self.opt_state = self.tx.init(self.params)
        self._global_step = 0

    def _schedule(self):
        c = self.cfg
        total = max(1, c.epochs * c.steps_per_epoch // max(1, c.accumulation_steps))
        warm = c.warmup_epochs * c.steps_per_epoch // max(1, c.accumulation_steps)
        if c.scheduler in ("warmup_cosine", "cosine"):
            if warm > 0:
                return optax.warmup_cosine_decay_schedule(
                    0.0, c.learning_rate, warm, total, end_value=1e-6
                )
            return optax.cosine_decay_schedule(c.learning_rate, total, alpha=1e-6 / c.learning_rate)
        # StepLR(step_size=30 epochs, gamma=0.1) fallback (ref:train.py:122)
        return optax.exponential_decay(
            c.learning_rate, 30 * c.steps_per_epoch, 0.1, staircase=True
        )

    # ------------------------------------------------------------- step ----
    def _build_step(self, model=None):
        cfg = self.cfg
        model = model if model is not None else self.model

        def loss_fn(params, batch, rng, curiosity_on, kl_w):
            # per-sample guidance: an explicit batch['guidance'] (int32 [B]
            # instruction indices paired with instruction-DEPENDENT labels,
            # e.g. the aimed procedural law) wins; otherwise guided_training
            # samples a uniform instruction per sample per step (labels
            # instruction-invariant).
            guidance = batch.get("guidance")
            if guidance is None and cfg.guided_training:
                from cognitive_aim_tpu.models import guidance as G

                grng, rng = jax.random.split(rng)
                guidance = jax.random.randint(
                    grng, (batch["images"].shape[0],), 0, len(G.INSTRUCTIONS)
                )
            pipe_kw = {}
            if cfg.pipeline_stages > 1:
                pipe_kw = dict(pipeline_mesh=self.mesh,
                               pipeline_n_micro=cfg.pipeline_n_micro)
            out = model.apply(
                params, batch["images"], batch.get("exif"), guidance=guidance,
                rng=rng, train=True, curiosity_kl_weight=kl_w, **pipe_kw,
            )
            pred = out.depth[:, 0]
            target = scalar_depth_target(batch["depths"])
            depth_loss = LS.scale_invariant_loss(pred, target, cfg.loss_lambda)

            pred_error = jnp.abs(pred - target)
            cur_loss = LS.curiosity_loss(out.curiosity, pred_error)
            cur_loss = jnp.where(curiosity_on, cur_loss, 0.0)

            total = depth_loss + cfg.curiosity_weight * cur_loss
            if cfg.attention_entropy_weight > 0 and "attention_entropy" in out.aux:
                total = total + cfg.attention_entropy_weight * out.aux["attention_entropy"]
            return total, {
                "loss": total,
                "depth_loss": depth_loss,
                "curiosity_loss": cur_loss,
            }

        def step(params, opt_state, batch, rng, curiosity_on, kl_w):
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng, curiosity_on, kl_w
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, logs

        pspec = param_shardings(self.mesh, self.params, cfg.tensor_parallel)
        return jax.jit(
            step,
            donate_argnums=(0, 1),
            out_shardings=(pspec, None, None),
        )

    def train_step(self, batch: Dict[str, np.ndarray], rng,
                   fetch_logs: bool = True) -> Dict:
        """One optimizer step. `fetch_logs=False` keeps the loss scalars on
        device (no host sync — important through high-latency links; the
        epoch loop fetches only at log_interval)."""
        batch = self._device_batch(batch)
        curiosity_on = jnp.asarray(
            self.epoch >= self.cfg.curiosity_warmup_epochs
            and self.model.arch.use_curiosity
        )
        from cognitive_aim_tpu.train.schedules import beta_schedule

        kl_w = jnp.asarray(
            beta_schedule(self.cfg.beta_schedule, self.cfg.beta_start,
                          self.cfg.beta_end, self.cfg.epochs)(self.epoch),
            jnp.float32,
        )
        step_fn = self._step_fn
        if self._alt_step_fn is not None and self._global_step % 2 == 1:
            step_fn = self._alt_step_fn
        self.params, self.opt_state, logs = step_fn(
            self.params, self.opt_state, batch, rng, curiosity_on, kl_w
        )
        self._global_step += 1
        if fetch_logs:
            return {k: float(v) for k, v in logs.items()}
        return logs

    def _device_batch(self, batch):
        batch = {
            "images": jnp.asarray(batch["images"], jnp.float32),
            "depths": jnp.asarray(batch["depths"], jnp.float32),
            **(
                # per-sample instruction indices (int32 [B]) paired with
                # instruction-DEPENDENT labels — overrides guided_training's
                # per-step sampling in the loss (see _build_step)
                {"guidance": jnp.asarray(batch["guidance"], jnp.int32)}
                if "guidance" in batch
                else {}
            ),
            **(
                {"exif": {k: jnp.asarray(v) for k, v in batch["exif"].items()}}
                if "exif" in batch
                else {}
            ),
        }
        return shard_batch(self.mesh, batch)

    # ------------------------------------------------------------ loops ----
    def train_epoch(self, loader, rng) -> Dict[str, float]:
        device_logs = []
        n = 0
        for i, batch in enumerate(loader):
            logs = self.train_step(batch, jax.random.fold_in(rng, i),
                                   fetch_logs=False)
            device_logs.append(logs)
            n += 1
            if self.writer and i % self.cfg.log_interval == 0:
                host = {k: float(v) for k, v in logs.items()}
                gs = self.epoch * len(loader) + i
                self.writer.add_scalar("Train/BatchLoss", host["loss"], gs)
                self.writer.add_scalar("Train/DepthLoss", host["depth_loss"], gs)
                self.writer.add_scalar(
                    "Train/CuriosityLoss", host["curiosity_loss"], gs
                )
        if not device_logs:
            return {}
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs).mean(), *device_logs)
        return {k: float(v) for k, v in stacked.items()}

    def validate(self, loader) -> Dict[str, float]:
        total = 0.0
        n = 0
        preds, targets = [], []
        self._last_val_visuals = None
        curiosities = []
        for batch in loader:
            db = self._device_batch(batch)
            out = self._eval_fn(self.params, db["images"], db.get("exif"),
                                jax.random.PRNGKey(0))
            if self.cfg.rich_logging:
                curiosities.append(np.asarray(out.curiosity))
                if self._last_val_visuals is None:
                    self._last_val_visuals = {
                        "attention": np.asarray(out.attention),
                        "curiosity": np.asarray(out.curiosity),
                    }
            pred = np.asarray(out.depth[:, 0])
            target = np.asarray(scalar_depth_target(db["depths"]))
            total += float(
                LS.scale_invariant_loss(jnp.asarray(pred), jnp.asarray(target),
                                        self.cfg.loss_lambda)
            )
            preds.append(pred)
            targets.append(target)
            n += 1
        metrics = {}
        if preds:
            metrics = calculate_depth_metrics(
                np.concatenate(preds), np.concatenate(targets)
            )
        metrics["val_loss"] = total / max(n, 1)
        if self.cfg.rich_logging and curiosities:
            allc = np.concatenate(curiosities)
            metrics["curiosity_mean"] = float(allc.mean())
            metrics["curiosity_std"] = float(allc.std())
        return metrics

    def _log_rich(self, epoch: int):
        """configs' logging.curiosity surface (declared but unimplemented in
        the reference): attention heatmap images + curiosity statistics +
        exploration-history stats to TensorBoard."""
        vis = getattr(self, "_last_val_visuals", None)
        if not (self.writer and vis):
            return
        attn = vis["attention"]  # [B, N]
        g = int(attn.shape[1] ** 0.5)
        k = min(self.cfg.num_save_images, attn.shape[0])
        for i in range(k):
            hm = attn[i, : g * g].reshape(g, g)
            lo, hi = float(hm.min()), float(hm.max())
            hm = (hm - lo) / (hi - lo + 1e-12)
            self.writer.add_image(
                f"Val/AttentionHeatmap/{i}", hm[None].astype(np.float32), epoch
            )
        if hasattr(self.model, "exploration_history"):
            self.model.record_exploration(vis["curiosity"])
            for k2, v in self.model.get_exploration_stats().items():
                if isinstance(v, (int, float)):
                    self.writer.add_scalar(f"Exploration/{k2}", v, epoch)

    def fit(self, train_loader, val_loader, epochs: Optional[int] = None):
        epochs = epochs or self.cfg.epochs
        rng = jax.random.PRNGKey(self.cfg.seed)
        history = []
        for epoch in range(self.epoch, epochs):
            self.epoch = epoch
            train_logs = self.train_epoch(train_loader, jax.random.fold_in(rng, epoch))
            val = self.validate(val_loader)
            if self.writer:
                # train_logs is empty when the train loader yields no batches
                # (fewer samples than batch_size with drop_last)
                if "loss" in train_logs:
                    self.writer.add_scalar(
                        "Train/EpochLoss", train_logs["loss"], epoch)
                    self.writer.add_scalar(
                        "Train/DepthLoss", train_logs["depth_loss"], epoch)
                self.writer.add_scalar("Val/Loss", val["val_loss"], epoch)
                for k in ("rmse", "mae", "abs_rel", "delta1",
                          "curiosity_mean", "curiosity_std"):
                    if k in val:
                        self.writer.add_scalar(f"Val/{k}", val[k], epoch)
                if self.cfg.rich_logging:
                    self._log_rich(epoch)
            is_best = val["val_loss"] < self.best_val_loss
            if is_best:
                self.best_val_loss = val["val_loss"]
            if epoch % self.cfg.save_interval == 0 or is_best:
                self.save_checkpoint(is_best)
            history.append({"epoch": epoch, **train_logs, **val})
        return history

    # ------------------------------------------------------- checkpoints ----
    def save_checkpoint_orbax(self, path: str):
        """Orbax native checkpoint of the parameter pytree (async-capable,
        sharding-aware — the production-scale option; npz is the portable
        default)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), self.params, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint_orbax(self, path: str):
        """Sharding-aware restore: each leaf is restored directly into its
        NamedSharding on the mesh (on multi-host meshes every process reads
        only its own shards from the checkpoint — no host-RAM full copy,
        no post-hoc reshard)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # abstract target from the sharding RULES + live leaf shapes — no
        # device_put of a full sharded params copy just to read .sharding
        # (a transient duplicate allocation that can OOM large models)
        shardings = param_shardings(self.mesh, self.params,
                                    self.cfg.tensor_parallel)
        abstract = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            self.params, shardings,
        )
        self.params = ckptr.restore(os.path.abspath(path), abstract)
        self.opt_state = self.tx.init(self.params)

    def save_checkpoint(self, is_best: bool, filename: str = "checkpoint.npz"):
        """latest + best copy + per-epoch file (ref:src/utils.py:46-62)."""
        from cognitive_aim_tpu.api import flatten_tree

        path = os.path.join(self.output_dir, filename)
        state = {
            **{f"params/{k}": v for k, v in flatten_tree(self.params).items()},
            "meta/epoch": np.asarray(self.epoch),
            "meta/best_val_loss": np.asarray(self.best_val_loss),
        }
        # provenance stamp: weights trained WITH an active token filter are
        # the only ones the filter's parity certification covers
        # (recipe-conditional, docs/PERF.md); api.py warns when a filter
        # config loads weights without a matching stamp (VERDICT r4 #8)
        from cognitive_aim_tpu.models.config import token_filter_spec

        arch = getattr(self.model, "arch", None)
        if arch is not None and getattr(arch, "token_filter_train", False):
            spec = token_filter_spec(arch)
            if spec:
                state["__meta__/train_filter"] = np.asarray(spec)
        np.savez(path, **state)
        if is_best:
            shutil.copyfile(path, os.path.join(self.output_dir, "model_best.npz"))
        shutil.copyfile(
            path, os.path.join(self.output_dir, f"checkpoint_epoch_{self.epoch}.npz")
        )

    def load_checkpoint(self, path: str):
        if path.endswith((".pth", ".pt")):
            # reference torch checkpoint (ref:train.py:326-333 restores model/
            # optimizer/scheduler; optimizer state is torch-specific so only
            # model params transfer — optimizer restarts fresh)
            from cognitive_aim_tpu.api import CognitiveAimInference  # noqa: F401
            from cognitive_aim_tpu.io import checkpoint_torch as ct

            sd = ct.load_torch_file(path)
            incoming = {}
            try:
                incoming["backbone"] = ct.convert_backbone(sd, "backbone.")
            except KeyError:
                pass
            for name, fn in (
                ("ambient_stream", lambda: ct.convert_ambient(sd)),
                ("focal_stream", lambda: ct.convert_iterative_focal(sd)),
                ("exif_prior", lambda: ct.convert_exif_prior(sd)),
                ("curiosity_module", lambda: ct.convert_curiosity(sd)),
            ):
                try:
                    incoming[name] = fn()
                except KeyError:
                    pass
            try:
                incoming.update(ct.convert_heads(sd))
            except KeyError:
                pass
            merged, loaded, skipped = ct.filter_and_merge(self.params, incoming)
            self.params = shard_params(self.mesh, merged, self.cfg.tensor_parallel)
            self.opt_state = self.tx.init(self.params)
            print(f"Resumed model params from torch ckpt {path}: "
                  f"{loaded} tensors ({skipped} skipped); optimizer reset")
            return

        from cognitive_aim_tpu.api import unflatten_npz

        data = np.load(path)
        tree = unflatten_npz(data)
        self.params = jax.tree.map(
            lambda t, i: jnp.asarray(i, t.dtype), self.params, tree["params"]
        )
        self.params = shard_params(self.mesh, self.params, self.cfg.tensor_parallel)
        self.opt_state = self.tx.init(self.params)
        self.epoch = int(data["meta/epoch"]) + 1
        self.best_val_loss = float(data["meta/best_val_loss"])
