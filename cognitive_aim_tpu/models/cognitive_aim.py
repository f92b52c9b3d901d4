"""CognitiveAimModel — the full cognitive depth-estimation pipeline, TPU-native.

One jitted forward computes everything exactly once, replacing the
reference's redundant control flow (`forward` re-runs the backbone up to 3x
and the focal stream up to 4x per image purely to stash attention weights —
ref:src/model.py:1064-1155; eval outputs are unchanged by computing each
sub-result once). Guidance is a static instruction index into a precomputed
[9, N] mask table instead of per-call Python loops. Attention maps are
explicit return values, not module attributes (the reference's
`_last_attention_weights` implicit-state pattern, ref:src/model.py:1211,
cleared externally at ref:demo.py:333-335).

Deliberate fixes of reference accidents (SURVEY.md §7 "hard parts"), each
config-gated or documented:
  * guided projection: with the shipped IterativeFocalStream the reference
    reaches the `temp_projection` fallback that creates a FRESH RANDOM
    Linear(768, 64) on every call (ref:src/model.py:1417-1422), so guided
    depths are untrained noise that changes run to run. Here the equivalent
    projection is a persistent parameter (`guided_projection`) with the same
    torch-default init — deterministic, trainable, same distribution at init.
    With a single (non-iterative) FocalStream the reference uses the stream's
    trained projection (ref:1417-1418) and so do we.
  * missing-module guided fusion: when fewer than 3 streams are enabled the
    reference's guided path crashes on the 192-dim fusion matmul and silently
    falls back to UNGUIDED forward (ref:src/model.py:1237-1240). Here the
    concat is zero-padded to 192 (like the unguided path, ref:1031-1040) and
    guidance is kept.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.core.precision import DEFAULT_POLICY, Policy
from cognitive_aim_tpu.core.rng import NoiseMode
from cognitive_aim_tpu.models import curiosity as C
from cognitive_aim_tpu.models import guidance as G
from cognitive_aim_tpu.models import streams as S
from cognitive_aim_tpu.models.config import ModelArchConfig
from cognitive_aim_tpu.nn import dinov2
from cognitive_aim_tpu.nn import init as tinit
from cognitive_aim_tpu.nn import layers as L


@dataclasses.dataclass
class ModelOutput:
    depth: jnp.ndarray  # [B, 1] Softplus — positive depth (ref:925-928)
    confidence: jnp.ndarray  # [B, 1] Sigmoid (ref:936-941)
    attention: Optional[jnp.ndarray]  # [B, N] per-patch attention or None
    curiosity: Optional[jnp.ndarray]  # [B] curiosity reward
    fused_features: jnp.ndarray  # [B, 192] post-fusion features
    aux: Dict[str, Any]


jax.tree_util.register_dataclass(
    ModelOutput,
    data_fields=["depth", "confidence", "attention", "curiosity", "fused_features", "aux"],
    meta_fields=[],
)


class CognitiveAimModel:
    """Holds static architecture config; parameters live in an explicit
    pytree (init() -> params, apply(params, ...) -> ModelOutput)."""

    def __init__(
        self,
        arch: ModelArchConfig,
        policy: Policy = DEFAULT_POLICY,
        attn_impl: str = "xla",
        vit_cfg: Optional[dinov2.DinoV2Config] = None,
    ):
        self.arch = arch
        self.policy = policy
        if attn_impl.startswith("pallas") and jax.default_backend() != "tpu":
            attn_impl = "xla"  # Pallas kernels compile only for TPU
        self.attn_impl = attn_impl
        self.vit_cfg = vit_cfg or dinov2.config_for(
            arch.backbone_size, use_lora=arch.use_lora, lora_rank=arch.lora_rank,
            lora_alpha=arch.lora_alpha, lora_targets=tuple(arch.lora_targets),
            gelu_approx=policy.fast_gelu,
        )
        if vit_cfg is not None and arch.use_lora and not vit_cfg.use_lora:
            # an explicit vit_cfg (tiny/layer-override paths) must still
            # honor the arch's adapter settings — otherwise use_lora=True
            # silently trains nothing (the adapter tensors never enter the
            # traced forward)
            import dataclasses as _dc

            self.vit_cfg = _dc.replace(
                vit_cfg, use_lora=True, lora_rank=arch.lora_rank,
                lora_alpha=arch.lora_alpha,
                lora_targets=tuple(arch.lora_targets))
        # stream/curiosity widths follow the backbone hidden size (the
        # reference hardcodes 768 even for 'large', where its curiosity call
        # then always fails on shape mismatch and silently degrades —
        # ref:src/model.py:948-952 with :995-1001; we use the actual width)
        self.feature_dim = self.vit_cfg.hidden_size
        self.exploration_history = C.ExplorationHistory()

    # ------------------------------------------------------------- init ----
    def init(self, key) -> Dict:
        a = self.arch
        D = self.feature_dim
        ks = jax.random.split(key, 10)
        params: Dict[str, Any] = {
            "backbone": dinov2.init(ks[0], self.vit_cfg),
        }
        if a.use_ambient:
            params["ambient_stream"] = S.ambient_init(ks[1], D)
        if a.use_focal:
            if a.use_iterative:
                params["focal_stream"] = S.iterative_focal_init(
                    ks[2], D, a.focal_hidden_dim, a.num_iterations, a.curiosity_guided
                )
                # persistent replacement for the per-call fresh Linear
                # fallback (ref:src/model.py:1419-1422); torch-default init
                kw, kb = jax.random.split(ks[3])
                params["guided_projection"] = {
                    "w": tinit.kaiming_uniform_linear(kw, D, 64),
                    "b": tinit.linear_bias_default(kb, D, 64),
                }
            else:
                params["focal_stream"] = S.focal_init(
                    ks[2], D, a.focal_hidden_dim, 8, a.curiosity_guided
                )
        if a.use_exif:
            params["exif_prior"] = S.exif_prior_init(ks[4], a.num_cameras)
        if a.use_curiosity:
            # hidden 256 as in the reference (ref:948-952)
            params["curiosity_module"] = C.curiosity_init(
                ks[5], D, 256, a.enable_hierarchical_curiosity,
            )
        # fusion Linear(192,192) torch-default (ref:908-912)
        params["fusion"] = {"fc0": L.linear_init(ks[6], a.fusion_dim, a.fusion_dim)}
        # decision head: xavier_uniform gain 1.0, bias 1.0 (ref:930-933)
        kdw, _ = jax.random.split(ks[7])
        params["decision_head"] = {
            "fc0": {
                "w": tinit.xavier_uniform(kdw, a.fusion_dim, 1, 1.0),
                "b": jnp.ones((1,), jnp.float32),
            }
        }
        # confidence head: default inits except final bias = 2.0 (ref:936-945)
        kc0, kc1 = jax.random.split(ks[8])
        conf = {
            "fc0": L.linear_init(kc0, a.fusion_dim, 1),
            "fc1": L.linear_init(kc1, 1, 1),
        }
        conf["fc1"]["b"] = jnp.full((1,), 2.0, jnp.float32)
        params["confidence_head"] = conf
        return params

    def merge_lora_params(self, params: Dict, rank: int = 0,
                          alpha: int = 0) -> Dict:
        """Deployment fold of adapter-gated sandwich weights: backbone
        LoRA tensors are merged into the dense weights (zero runtime
        overhead on the filtered fast path) and dropped from the tree.
        rank/alpha default to the arch's settings; pass explicitly when
        this model was built without use_lora (the merged-deployment
        engines are). No-op when the tree has no adapter tensors."""
        bb = params.get("backbone", {})
        if not any(k.startswith("lora")
                   for k in bb.get("layers", {})):
            return params
        r = rank or self.arch.lora_rank
        a = alpha or self.arch.lora_alpha
        out = dict(params)
        out["backbone"] = dinov2.merge_lora(bb, a / r)
        return out

    def prepare_params(self, params: Dict) -> Dict:
        """Post-load parameter transform for the active policy: quantizes the
        backbone dense projections to int8 when policy.quantize_backbone,
        plus a fused int8 qkv weight per focal stream member (the three
        focal projections share one input, so they run as a single [D, 3D]
        in-VMEM-quantizing GEMM on the Pallas fast path). Call after
        init()/checkpoint load, before inference."""
        if not self.policy.quantize_backbone:
            return params
        import jax.numpy as jnp

        from cognitive_aim_tpu.kernels.int8_ops import (
            quantize_backbone_layers,
            quantize_weight,
        )

        out = dict(params)
        backbone = dict(params["backbone"])
        backbone["layers"] = quantize_backbone_layers(backbone["layers"])
        out["backbone"] = backbone
        def _with_qkv_i8(sp):
            sp = dict(sp)
            wcat = jnp.concatenate(
                [sp[n]["w"] for n in
                 ("query_proj", "key_proj", "value_proj")], axis=-1)
            bcat = jnp.concatenate(
                [sp[n]["b"] for n in
                 ("query_proj", "key_proj", "value_proj")], axis=-1)
            sp["qkv_i8"] = {"wq": quantize_weight(wcat), "b": bcat}
            return sp

        if self.arch.use_focal and "focal_stream" in params:
            fs = dict(params["focal_stream"])
            if "streams" in fs:  # IterativeFocalStream members
                fs["streams"] = [_with_qkv_i8(sp) for sp in fs["streams"]]
            elif "query_proj" in fs:  # single FocalStream
                fs = _with_qkv_i8(fs)
            out["focal_stream"] = fs
        return out

    # ------------------------------------------------------------ apply ----
    def apply(
        self,
        params: Dict,
        images: jnp.ndarray,
        exif_data: Optional[Dict[str, jnp.ndarray]] = None,
        *,
        guidance: Optional[Any] = None,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        noise_mode: NoiseMode = NoiseMode.SAMPLE,
        curiosity_kl_weight: Optional[Any] = None,
        pipeline_mesh=None,
        pipeline_n_micro: int = 4,
        precomputed_hs: Optional[jnp.ndarray] = None,
    ) -> ModelOutput:
        """Unified forward. `guidance` is None for the unguided path, or an
        instruction index (guidance.INSTRUCTIONS order) — scalar or per-sample
        [B] array, traced, so ONE compiled graph serves all 9 instructions
        (the reference rebuilds its mask with Python loops per call,
        ref:src/model.py:1268-1379). The two reference entry points `forward`
        (ref:1064) and `forward_with_guidance` (ref:1157) collapse into this
        one function.

        images: [B, H, W, 3] normalized NHWC. exif_data: dict of [B] arrays
        ('camera_idx' int; 'focal_length'/'aperture'/'iso' float, raw units
        on the demo path per ref:demo.py:263-268).
        """
        a = self.arch
        filter_kw = {}
        if a.token_filter_active and (not train or a.token_filter_train):
            # opt-in approximate fast path (token_filter_* config; OFF by
            # default). Guided-region tokens get keep priority so the focal
            # re-pool (ref:1400-1414 blend) sees fresh features where the
            # instruction points. token_filter_schedule gives the
            # progressive (multi-stage) variant.
            filter_kw = dict(
                filter_layer=a.token_filter_layer,
                filter_keep=a.token_filter_keep,
                filter_fuse=a.token_filter_fuse,
                filter_fuse_k=a.token_filter_fuse_k,
                filter_schedule=a.token_filter_schedule,
                filter_rollout=a.token_filter_rollout,
                filter_merge=a.token_filter_merge,
                filter_delta_correct=a.token_filter_delta_correct,
                filter_strat_stride=a.token_filter_strat_stride,
                filter_prop_attn=a.token_filter_prop_attn,
                filter_ctx_frac=a.token_filter_ctx_frac,
            )
            if guidance is not None:
                B = images.shape[0]
                p = self.vit_cfg.patch_size
                gh, gw = images.shape[1] // p, images.shape[2] // p
                gvec = G.mask_table(gh, gh * gw)[jnp.asarray(guidance, jnp.int32)]
                if gvec.ndim == 1:
                    gvec = jnp.broadcast_to(gvec[None], (B, gh * gw))
                filter_kw["keep_weights"] = gvec
        if precomputed_hs is not None:
            # post-backbone seam: run the cognitive pipeline on an
            # externally supplied [B, 1+N, D] token stream. Diagnostic
            # surface (scripts/probe_tail_mechanism.py substitutes hybrid
            # exact/filtered streams to localize parity drift); `images`
            # is still required for the guidance grid geometry.
            hs = jnp.asarray(precomputed_hs, jnp.float32)
        elif pipeline_mesh is not None:
            # GPipe backbone over the mesh's `pipe` axis (latency option
            # for the 24-layer `large` backbone); cognitive streams, fusion
            # and heads stay data-parallel. Token filtering is a
            # single-device optimization and doesn't compose with the
            # stage-sharded layer stack.
            if filter_kw:
                raise ValueError(
                    "token filtering and pipeline parallelism are mutually "
                    "exclusive (the filter re-shapes the stream mid-stack)")
            if self.policy.quantize_backbone:
                raise ValueError(
                    "pipeline parallelism requires unquantized backbone "
                    "params (use policy='default'/'f32')")
            import os as _os

            hs = dinov2.apply_pipelined(
                params["backbone"], images, self.vit_cfg, pipeline_mesh,
                n_micro=pipeline_n_micro,
                compute_dtype=self.policy.backbone_compute_dtype,
                attn_impl=self.attn_impl,
                # pipelined TRAINING (TrainConfig.pipeline_stages) recomputes
                # each stage chunk in backward — the GPipe memory discipline;
                # same CAIM_TRAIN_REMAT escape hatch as the sequential path
                remat=train and _os.environ.get(
                    "CAIM_TRAIN_REMAT", "1") == "1",
            ).astype(jnp.float32)
        else:
            import os as _os

            hs = dinov2.apply(
                params["backbone"], images, self.vit_cfg,
                compute_dtype=self.policy.backbone_compute_dtype,
                attn_impl=self.attn_impl,
                # per-block activation remat for training memory; the env
                # knob lets scripts/bench_train.py A/B the FLOPs-vs-HBM
                # trade (CAIM_TRAIN_REMAT=0 disables — viable at small
                # batch; ~1.3x step FLOPs bought back as activation memory
                # when on, SURVEY.md HBM note)
                remat=train and _os.environ.get(
                    "CAIM_TRAIN_REMAT", "1") == "1",
                **filter_kw,
            ).astype(jnp.float32)
        cls_token = hs[:, 0]
        patches = hs[:, 1:]
        B, N, D = patches.shape
        aux: Dict[str, Any] = {}

        rngs = {}
        if rng is not None:
            for i, name in enumerate(("curiosity", "focal", "dropout")):
                rngs[name] = jax.random.fold_in(rng, i)

        with jax.default_matmul_precision("highest"):
            # curiosity score from CLS features; exif NOT passed here —
            # matches ref:1185 (geometric term sees exif only in the training
            # loss path, ref:1432-1454)
            if a.use_curiosity:
                reward, _, comps = C.curiosity_apply(
                    params["curiosity_module"], cls_token,
                    kl_weight=0.1 if curiosity_kl_weight is None
                    else curiosity_kl_weight,
                    rng=rngs.get("curiosity"), train=train, noise_mode=noise_mode,
                )
                curiosity_score = reward
                aux["curiosity_components"] = comps
            else:
                # ref default when module missing (ref:1003-1005)
                curiosity_score = jnp.full((B,), 0.5, jnp.float32)
                reward = curiosity_score

            raw_feats = []
            attention = None
            if a.use_ambient:
                raw_feats.append(
                    S.ambient_apply(
                        params["ambient_stream"], cls_token,
                        rng=rngs.get("dropout"), train=train,
                    )
                )

            if a.use_focal:
                # focal streams carry 3 full NxN attentions — run them in the
                # policy compute dtype with DEFAULT matmul precision (bf16 MXU
                # path); softmax/aggregation inside stay f32
                with jax.default_matmul_precision(
                    "highest"
                    if self.policy.backbone_compute_dtype == jnp.float32
                    else "default"
                ):
                    focal_feats, attention, entropy = self._focal(
                        params, patches, curiosity_score, guidance,
                        rng=rngs.get("focal"), train=train, noise_mode=noise_mode,
                    )
                focal_feats = focal_feats.astype(jnp.float32)
                attention = attention.astype(jnp.float32)
                raw_feats.append(focal_feats)
                aux["attention_entropy"] = entropy

            if a.use_exif and exif_data is not None:
                raw_feats.append(
                    S.exif_prior_apply(
                        params["exif_prior"], exif_data,
                        rng=rngs.get("dropout"), train=train,
                    )
                )

            if not raw_feats:
                raise RuntimeError("Cognitive modules returned no features!")
            concat = jnp.concatenate(raw_feats, axis=1)
            if concat.shape[1] < a.fusion_dim:  # zero-pad (ref:1031-1040)
                pad = jnp.zeros((B, a.fusion_dim - concat.shape[1]), concat.dtype)
                concat = jnp.concatenate([concat, pad], axis=1)

            fused = jax.nn.relu(L.linear_apply(params["fusion"]["fc0"], concat))
            if train and rng is not None:
                fused = L.dropout(jax.random.fold_in(rng, 99), fused, 0.1)

            depth = jax.nn.softplus(
                L.linear_apply(params["decision_head"]["fc0"], fused)
            )
            c = jax.nn.relu(L.linear_apply(params["confidence_head"]["fc0"], fused))
            confidence = jax.nn.sigmoid(
                L.linear_apply(params["confidence_head"]["fc1"], c)
            )

        return ModelOutput(
            depth=depth,
            confidence=confidence,
            attention=attention,
            curiosity=reward,
            fused_features=fused,
            aux=aux,
        )

    # ------------------------------------------------------------ focal ----
    def _focal(self, params, patches, curiosity_score, guidance, *, rng, train,
               noise_mode):
        a = self.arch
        cd = self.policy.backbone_compute_dtype
        run = patches.astype(cd)
        # int8 qkv weights and their f32 scales pass through the cast
        fparams = jax.tree_util.tree_map_with_path(
            lambda path, t: t
            if (t.dtype == jnp.int8
                or any(getattr(p, "key", None) == "wq" for p in path))
            else t.astype(cd),
            params["focal_stream"],
        )
        # fused NxN focal-attention kernel rides the same gate as the Pallas
        # backbone attention (TPU-only fast path; XLA path is the parity
        # reference)
        fused = self.attn_impl.startswith("pallas")
        if a.use_iterative:
            feats, attn, entropy = S.iterative_focal_apply(
                fparams, run, curiosity_score,
                focus_strength=a.focus_strength,
                curiosity_guided=a.curiosity_guided,
                rng=rng, train=train, noise_mode=noise_mode,
                fused_attention=fused,
            )
        else:
            feats, attn, entropy = S.focal_apply(
                fparams, run, curiosity_score,
                curiosity_guided=a.curiosity_guided,
                rng=rng, train=train, noise_mode=noise_mode,
                fused_attention=fused,
            )
        if guidance is None:
            return feats, attn, entropy

        # guided blend (ref:1400-1414): 0.7*mask + 0.3*base_attention,
        # temperature-0.05 softmax, re-pool the ORIGINAL patch tokens
        N = patches.shape[1]
        g = int(N**0.5)
        g_idx = jnp.asarray(guidance, jnp.int32)
        gvec = G.mask_table(g, N)[g_idx]  # [N] or [B, N]
        if gvec.ndim == 1:
            gvec = gvec[None]
        guided = 0.7 * gvec + 0.3 * attn
        guided = jax.nn.softmax(guided / 0.05, axis=-1)
        weighted = (patches * guided[..., None]).sum(axis=1)
        if a.use_iterative:
            gfeats = L.linear_apply(params["guided_projection"], weighted)
        else:
            gfeats = L.mlp_apply(
                params["focal_stream"]["projection"], weighted,
                dropout_rate=0.1, dropout_after=(0,), rng=rng, train=train,
            )
        return gfeats, guided, entropy

    # --------------------------------------------------------- training ----
    def compute_curiosity_loss(
        self, params, features, exif_data=None, *, loss_type="robust",
        uncertainty_weight=0.1, kl_weight=0.1, rng=None,
        noise_mode=NoiseMode.SAMPLE,
    ):
        """ref:src/model.py:1432-1454 — curiosity over fused/backbone features
        WITH exif (geometric term active). kl_weight supports the configs'
        variational beta schedule (train/schedules.py)."""
        reward, _, comps = C.curiosity_apply(
            params["curiosity_module"], features, exif_data,
            loss_type=loss_type, uncertainty_weight=uncertainty_weight,
            kl_weight=kl_weight, rng=rng, noise_mode=noise_mode,
        )
        return reward, comps

    def get_exploration_stats(self):
        return self.exploration_history.statistics()

    def record_exploration(self, rewards):
        self.exploration_history.update(rewards)
