"""PyTorch -> JAX checkpoint converter.

Converts a reference `cognitive_aim_model.pth` state dict (or any torch
state dict produced by the reference architecture) into this framework's
parameter pytree. Replicates the reference's tolerant-loading semantics:

  * container formats: `model_state_dict` / `main_model` / raw dict
    (ref:demo.py:97-106);
  * per-tensor shape filtering against the live model — mismatched shapes are
    skipped, missing params keep their fresh initialization
    (ref:demo.py:108-146);
  * optional `create_model` prefix skip-list (ref:src/model.py:1554-1567).

Works on numpy arrays so it does not require torch at inference time: pass
either a torch state dict (tensors are `.numpy()`-ed) or a dict of numpy
arrays. Linear weights are transposed from torch's (out, in) to our (in, out);
the patch-embed conv kernel is reshaped to the patchify-matmul layout.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

CREATE_MODEL_SKIP_PREFIXES = (
    # ref:src/model.py:1556-1559
    "decision_head.",
    "confidence_head.",
    "curiosity_module.",
    "global_aligner.",
    "ambient_stream.",
    "focal_stream.",
    "exif_prior.",
    "fusion.",
)


def _np(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def unwrap_container(ckpt: Mapping) -> Mapping:
    """ref:demo.py:97-106 container detection."""
    if "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    if "main_model" in ckpt:
        return ckpt["main_model"]
    return ckpt


def _lin(sd, name):
    """torch Linear -> {'w': (in,out), 'b': (out,)}"""
    out = {"w": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["b"] = _np(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


# ----------------------------------------------------------- backbone -------
def convert_backbone(sd: Mapping, prefix: str = "backbone.") -> Dict:
    """HF Dinov2Model state dict -> nn/dinov2.py pytree (layers stacked)."""
    p = prefix
    n_layers = 0
    pat = re.compile(re.escape(p) + r"encoder\.layer\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            n_layers = max(n_layers, int(m.group(1)) + 1)

    conv_w = _np(sd[f"{p}embeddings.patch_embeddings.projection.weight"])
    D, C, ph, pw = conv_w.shape
    # conv (D, C, ph, pw) -> matmul (ph*pw*C, D) with (row, col, channel) order
    w = conv_w.transpose(2, 3, 1, 0).reshape(ph * pw * C, D)

    layer_trees = []
    for i in range(n_layers):
        lp = f"{p}encoder.layer.{i}."
        tree = {
            "norm1": _ln(sd, f"{lp}norm1"),
            "q": _lin(sd, f"{lp}attention.attention.query"),
            "k": _lin(sd, f"{lp}attention.attention.key"),
            "v": _lin(sd, f"{lp}attention.attention.value"),
            "attn_out": _lin(sd, f"{lp}attention.output.dense"),
            "ls1": _np(sd[f"{lp}layer_scale1.lambda1"]),
            "norm2": _ln(sd, f"{lp}norm2"),
            "fc1": _lin(sd, f"{lp}mlp.fc1"),
            "fc2": _lin(sd, f"{lp}mlp.fc2"),
            "ls2": _np(sd[f"{lp}layer_scale2.lambda1"]),
        }
        # reference LoRA params live OUTSIDE the backbone prefix:
        # lora_layers.{i}.lora_A / lora_B (ref:src/model.py:824-831)
        if f"lora_layers.{i}.lora_A" in sd:
            tree["lora_A"] = _np(sd[f"lora_layers.{i}.lora_A"])
            tree["lora_B"] = _np(sd[f"lora_layers.{i}.lora_B"])
        layer_trees.append(tree)

    stacked = jax.tree.map(lambda *xs: np.stack(xs, 0), *layer_trees)
    out = {
        "cls_token": _np(sd[f"{p}embeddings.cls_token"]),
        "pos_embed": _np(sd[f"{p}embeddings.position_embeddings"]),
        "patch_embed": {
            "w": w,
            "b": _np(sd[f"{p}embeddings.patch_embeddings.projection.bias"]),
        },
        "layers": stacked,
        "final_norm": _ln(sd, f"{p}layernorm"),
    }
    if f"{p}embeddings.mask_token" in sd:
        out["mask_token"] = _np(sd[f"{p}embeddings.mask_token"])
    return out


# ----------------------------------------------------- cognitive modules ----
def _seq_mlp(sd, name, linear_indices):
    """torch nn.Sequential of Linears (at the given indices) -> mlp pytree."""
    return {
        f"fc{j}": _lin(sd, f"{name}.{idx}") for j, idx in enumerate(linear_indices)
    }


def convert_focal_stream(sd, name):
    """FocalStream params (ref:src/model.py:55-127)."""
    return {
        "query_proj": _lin(sd, f"{name}.query_proj"),
        "key_proj": _lin(sd, f"{name}.key_proj"),
        "value_proj": _lin(sd, f"{name}.value_proj"),
        # projection: Sequential(Linear, ReLU, Dropout, Linear) -> idx 0, 3
        "projection": _seq_mlp(sd, f"{name}.projection", (0, 3)),
        "adaptive_weight": _np(sd[f"{name}.adaptive_weight"]),
        **(
            {
                "curiosity_modulator": _seq_mlp(
                    sd, f"{name}.curiosity_modulator", (0, 2)
                )
            }
            if f"{name}.curiosity_modulator.0.weight" in sd
            else {}
        ),
    }


def convert_iterative_focal(sd, name="focal_stream"):
    """IterativeFocalStream (ref:src/model.py:315-389): N member streams
    (kept as a list — members have independent weights), fusion MLP,
    initial_focus, optional curiosity_amplifier."""
    n = 0
    pat = re.compile(re.escape(name) + r"\.focal_streams\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            n = max(n, int(m.group(1)) + 1)
    out = {
        "streams": [
            convert_focal_stream(sd, f"{name}.focal_streams.{i}") for i in range(n)
        ],
        "fusion": _seq_mlp(sd, f"{name}.fusion", (0, 2)),
        "initial_focus": _np(sd[f"{name}.initial_focus"]),
    }
    if f"{name}.curiosity_amplifier.0.weight" in sd:
        out["curiosity_amplifier"] = _seq_mlp(sd, f"{name}.curiosity_amplifier", (0, 2))
    return out


def convert_ambient(sd, name="ambient_stream"):
    """AmbientStream MLP: Sequential(L,ReLU,Drop,L,ReLU,L) -> idx 0,3,5
    (ref:src/model.py:36-44)."""
    return {"mlp": _seq_mlp(sd, f"{name}.mlp", (0, 3, 5))}


def convert_exif_prior(sd, name="exif_prior"):
    """EXIFPriorDatabase (ref:src/model.py:457-479)."""
    return {
        "camera_embedding": {"table": _np(sd[f"{name}.camera_embedding.weight"])},
        "exif_encoder": _seq_mlp(sd, f"{name}.exif_encoder", (0, 2)),
        "fusion": _seq_mlp(sd, f"{name}.fusion", (0, 3)),
    }


def convert_curiosity(sd, name="curiosity_module"):
    """CuriosityModule (ref:src/model.py:521-584)."""
    out = {
        "encoder_mean": _seq_mlp(sd, f"{name}.encoder_mean", (0, 3)),
        "encoder_logvar": _seq_mlp(sd, f"{name}.encoder_logvar", (0, 3)),
        "decoder": _seq_mlp(sd, f"{name}.decoder", (0, 3)),
        "uncertainty_head": _seq_mlp(sd, f"{name}.uncertainty_head", (0, 2)),
    }
    if f"{name}.geometric_curiosity.0.weight" in sd:
        out["geometric_curiosity"] = _seq_mlp(sd, f"{name}.geometric_curiosity", (0, 2))
        out["local_curiosity"] = _seq_mlp(sd, f"{name}.local_curiosity", (0, 2))
        out["curiosity_weights"] = _np(sd[f"{name}.curiosity_weights"])
    return out


def convert_heads(sd):
    """fusion / decision_head / confidence_head (ref:src/model.py:908-945)."""
    return {
        "fusion": _seq_mlp(sd, "fusion", (0,)),
        "decision_head": _seq_mlp(sd, "decision_head", (0,)),
        "confidence_head": _seq_mlp(sd, "confidence_head", (0, 2)),
    }


# --------------------------------------------------------------- loading ----
def filter_and_merge(target_tree, incoming_tree):
    """demo.py shape-filter semantics (ref:demo.py:108-146): keep an incoming
    leaf only when a same-path leaf exists in the target with the same shape;
    everything else keeps the target's (fresh) value. Returns (merged,
    n_loaded, n_skipped)."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_tree)[0])
    flat_i = dict(jax.tree_util.tree_flatten_with_path(incoming_tree)[0])
    loaded = skipped = 0
    merged = {}
    for path, tval in flat_t.items():
        ival = flat_i.get(path)
        if ival is not None and tuple(np.shape(ival)) == tuple(np.shape(tval)):
            merged[path] = jnp.asarray(ival, dtype=jnp.asarray(tval).dtype)
            loaded += 1
        else:
            merged[path] = tval
            if ival is not None:
                skipped += 1
    treedef = jax.tree_util.tree_structure(target_tree)
    leaves = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(target_tree)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), loaded, skipped


def apply_skip_prefixes(sd: Mapping, skip_prefixes=CREATE_MODEL_SKIP_PREFIXES):
    """create_model's non-strict prefix skip (ref:src/model.py:1554-1567)."""
    return {
        k: v
        for k, v in sd.items()
        if not any(k.startswith(pref) for pref in skip_prefixes)
    }


def load_torch_file(path: str) -> Mapping:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return unwrap_container(ckpt)
