"""Inference engine — the `CognitiveAimInference` public surface
(ref:demo.py:26-600), TPU-native.

Differences by design:
  * one jitted forward per (batch shape, guided/unguided); the guidance
    instruction is a traced index, so all 9 instructions share one compiled
    graph and can be batched in a single device call
    (`predict_all_instructions` replaces running demo.py nine times for the
    nine-grid figure, ref:create_nine_grid_demo.py);
  * attention is an explicit model output (no `_last_attention_weights`
    clearing dance, ref:demo.py:333-335);
  * checkpoints: torch .pth via the converter (same tolerant-loading
    semantics) or native .npz/orbax.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from cognitive_aim_tpu.core.precision import policy_from_name
from cognitive_aim_tpu.core.rng import NoiseMode
from cognitive_aim_tpu.io import checkpoint_torch as ct
from cognitive_aim_tpu.io import exif as exif_io
from cognitive_aim_tpu.io.preprocess import (
    load_image_uint8,
    normalize_np,
    pil_resize_host,
)
from cognitive_aim_tpu.models import guidance as G
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import (
    parse_token_filter,
    resolve_model_config,
)
from cognitive_aim_tpu.utils.visualize import save_prediction_image


class CognitiveAimInference:
    def __init__(
        self,
        config_path: str,
        checkpoint_path: Optional[str] = None,
        device: str = "auto",
        *,
        lookup: str = "reference",
        policy: str = "default",
        attn_impl: str = "xla",
        seed: int = 0,
        noise_mode: str = "sample",
        save_images: bool = True,
        output_dir: str = "demo_results",
        vit_cfg=None,  # testing hook: override the backbone size
        token_filter: str = "",  # "LAYER:KEEP" opt-in approximate fast path
    ):
        with open(config_path, "r", encoding="utf-8") as f:
            self.config = yaml.safe_load(f)
        if token_filter:
            self.config.update(parse_token_filter(token_filter))

        # demo.py's default module injection (ref:demo.py:46-53)
        if "cognitive_modules" not in self.config and "cognitive_modules" not in self.config.get("model", {}):
            self.config["cognitive_modules"] = [
                "ambient_stream",
                "iterative_focal_stream",
                "exif_prior_database",
            ]

        self.arch = resolve_model_config(self.config, lookup=lookup)
        self.model = CognitiveAimModel(
            self.arch, policy=policy_from_name(policy), attn_impl=attn_impl,
            vit_cfg=vit_cfg,
        )
        self.noise_mode = NoiseMode(noise_mode)
        self.save_images = save_images
        self.output_dir = output_dir
        self.image_size = self.arch.image_size
        self.camera_to_id = {"unknown": 0}  # ref:demo.py:85
        self._rng = jax.random.PRNGKey(seed)
        self._rng_lock = threading.Lock()

        self.params = self.model.init(jax.random.PRNGKey(seed))
        if checkpoint_path:
            self.load_checkpoint(checkpoint_path)
        self.params = self.model.prepare_params(self.params)

        self._unguided = jax.jit(
            lambda p, x, e, k: self.model.apply(
                p, x, e, rng=k, noise_mode=self.noise_mode
            )
        )
        self._guided = jax.jit(
            lambda p, x, e, g, k: self.model.apply(
                p, x, e, guidance=g, rng=k, noise_mode=self.noise_mode
            )
        )

    # -------------------------------------------------------- checkpoint ----
    def load_checkpoint(self, path: str):
        """Tolerant loading: torch containers (model_state_dict / main_model /
        raw) with shape filtering, or a native .npz flat pytree. Continues on
        random init if the file cannot be read (ref:demo.py:148-150)."""
        try:
            if path.endswith((".npz", ".npy")):
                z = np.load(path)
                meta = npz_meta(z)
                self._check_filter_stamp(meta, path)
                incoming = unflatten_npz(z)
                incoming = self._maybe_merge_adapters(incoming, meta)
            else:
                sd = ct.load_torch_file(path)
                # torch checkpoints carry no provenance stamp
                self._check_filter_stamp({}, path)
                incoming = self._convert_state_dict(sd)
            self.params, loaded, skipped = ct.filter_and_merge(self.params, incoming)
            print(f"Loaded checkpoint {path}: {loaded} tensors, {skipped} skipped")
        except Exception as e:  # ref keeps random weights on failure
            print(f"Error loading checkpoint: {e}")
            print("Continuing with randomly initialized weights...")

    def _check_filter_stamp(self, meta: Dict[str, str], path: str):
        """Recipe-condition enforcement (VERDICT r4 #8): the token-filter
        fast configs are certified ONLY with weights trained/sandwiched
        for the spec (docs/PERF.md round-4/5 certification). If this
        engine runs a filter but the checkpoint carries no matching
        `__meta__/train_filter` stamp (written by the trainer /
        pretrain_procedural), warn loudly — or refuse when
        CAIM_REQUIRE_FILTER_STAMP=1."""
        from cognitive_aim_tpu.models.config import token_filter_spec

        spec = token_filter_spec(self.arch)
        if not spec:
            return
        stamp = meta.get("train_filter", "")
        if stamp == spec:
            return
        detail = (f"stamped for '{stamp}'" if stamp
                  else "carries no train-filter stamp")
        msg = (f"token filter '{spec}' is active but checkpoint {path} "
               f"{detail}. The filter's parity certification is "
               f"recipe-conditional: on weights not trained for the spec "
               f"the guided filter is REFUTED (worst-instruction gt-gap "
               f"up to 78%, docs/PERF.md). Train/sandwich for the spec "
               f"or drop token_filter_* from the config.")
        if os.environ.get("CAIM_REQUIRE_FILTER_STAMP", "") == "1":
            raise ValueError(msg)
        print(f"WARNING: {msg}")

    def _maybe_merge_adapters(self, incoming: Dict, meta: Dict[str, str]):
        """Deployment fold of adapter-gated sandwich checkpoints: when
        THIS engine runs a token filter and the checkpoint carries
        trained backbone LoRA adapters (stamped by pretrain_procedural
        --adapter-rank), fold them into the dense weights (zero runtime
        overhead; docs/PERF.md round-5). An exact-path engine skips the
        fold — its filter_and_merge drops the adapter tensors and serves
        the original weights bit-identically."""
        from cognitive_aim_tpu.models.config import token_filter_spec
        from cognitive_aim_tpu.nn import dinov2 as _dv

        filtered = bool(token_filter_spec(self.arch))
        out = dict(incoming)
        fp = out.pop("filterpath", None)
        if fp and filtered:
            # sandwich-v2 head deltas: the filtered path serves heads/
            # streams trained against filtered feature statistics; the
            # exact path (filterpath stripped) keeps the originals
            out.update(fp)
            print(f"Applied filterpath overlay ({len(fp)} subtrees: "
                  f"path-gated sandwich head deltas)")
        bb = out.get("backbone", {})
        has_lora = any(str(k).startswith("lora")
                       for k in bb.get("layers", {}))
        if not has_lora or not filtered:
            return out
        rank = int(meta.get("adapter_rank", "0") or 0)
        alpha = int(meta.get("adapter_alpha", str(rank)) or rank)
        if rank <= 0:
            return out
        out["backbone"] = _dv.merge_lora(bb, alpha / rank)
        print(f"Folded rank-{rank} filter adapters into backbone weights "
              f"(targets {meta.get('adapter_targets', '?')})")
        return out

    def _convert_state_dict(self, sd) -> Dict:
        a = self.arch
        out: Dict = {}
        try:
            out["backbone"] = ct.convert_backbone(sd, "backbone.")
        except KeyError:
            pass
        cvt = {
            "ambient_stream": (a.use_ambient, lambda: ct.convert_ambient(sd)),
            "focal_stream": (
                a.use_focal,
                lambda: ct.convert_iterative_focal(sd)
                if a.use_iterative
                else ct.convert_focal_stream(sd, "focal_stream"),
            ),
            "exif_prior": (a.use_exif, lambda: ct.convert_exif_prior(sd)),
            "curiosity_module": (a.use_curiosity, lambda: ct.convert_curiosity(sd)),
        }
        for name, (enabled, fn) in cvt.items():
            if enabled:
                try:
                    out[name] = fn()
                except KeyError:
                    pass
        try:
            out.update(ct.convert_heads(sd))
        except KeyError:
            pass
        return out

    def save_native_checkpoint(self, path: str):
        np.savez(path, **flatten_tree(self.params))

    # ---------------------------------------------------------- predict ----
    def _next_key(self):
        # lock: the HTTP server calls this from its dispatcher thread AND
        # per-request handler threads — an unguarded split can hand two
        # callers the same key (correlated noise) or drop an update
        with self._rng_lock:
            self._rng, k = jax.random.split(self._rng)
        return k

    def _prep_image(self, image_path: str):
        u8 = load_image_uint8(image_path)
        img = normalize_np(pil_resize_host(u8, self.image_size, self.image_size))
        return img[None].astype(np.float32), u8.shape[:2]

    def predict(
        self, image_path: str, instruction: Optional[str] = None
    ) -> Tuple[float, float, Dict]:
        """Single-image pipeline (ref:demo.py:298-404). Returns
        (depth, confidence, metadata)."""
        images, original_size = self._prep_image(image_path)
        exif_raw = exif_io.extract_exif(image_path)
        exif_arr = exif_io.exif_arrays_for_model(exif_raw, self.camera_to_id)
        exif_j = {k: jnp.asarray(v) for k, v in exif_arr.items()}

        if instruction is not None:
            gi = G.instruction_index(instruction)
            out = self._guided(
                self.params, jnp.asarray(images), exif_j,
                jnp.asarray(gi, jnp.int32), self._next_key(),
            )
        else:
            out = self._unguided(
                self.params, jnp.asarray(images), exif_j, self._next_key()
            )

        depth = float(np.asarray(out.depth).squeeze())
        confidence = float(np.asarray(out.confidence).squeeze())
        attention = (
            np.asarray(out.attention[0]) if out.attention is not None else None
        )
        if self.arch.use_curiosity and out.curiosity is not None:
            self.model.record_exploration(np.asarray(out.curiosity))

        if self.save_images:
            save_prediction_image(
                images[0], depth, confidence, attention, instruction, image_path,
                self.output_dir,
            )

        metadata = {
            "image_path": image_path,
            "original_size": tuple(int(v) for v in original_size[::-1]),
            "processed_size": (self.image_size, self.image_size),
            "exif_available": exif_raw is not None,
            "exif_source": "real" if exif_raw is not None else "default",
            "instruction": instruction,
            "cognitive_modules": self.config.get(
                "cognitive_modules",
                self.config.get("model", {}).get("cognitive_modules", []),
            ),
            "model_status": {
                "ambient": self.arch.use_ambient,
                "focal": self.arch.use_focal,
                "exif": self.arch.use_exif,
            },
            "exif_data": exif_raw
            or {
                "FocalLength": 50.0,
                "FNumber": 2.8,
                "ISOSpeedRatings": 100,
                "Model": "Default",
                "Make": "Default",
            },
        }
        return depth, confidence, metadata

    def predict_batch(
        self, image_paths: List[str], instructions: Optional[List[Optional[str]]] = None
    ) -> List[Tuple]:
        """ref:demo.py:406-432 surface; error entries mirror the reference's
        (None, None, {'error': ...}) tuples."""
        if instructions is None:
            instructions = [None] * len(image_paths)
        elif len(instructions) != len(image_paths):
            raise ValueError("Number of instructions must match number of images")
        results = []
        for path, instr in zip(image_paths, instructions):
            try:
                results.append(self.predict(path, instr))
            except Exception as e:
                results.append((None, None, {"error": str(e)}))
        return results

    def predict_all_instructions(self, image_path: str) -> Dict[str, Tuple[float, float]]:
        """All 9 instructions in ONE batched device call (the TPU-native
        nine-grid path). Returns {instruction: (depth, confidence)} and writes
        the 9 prediction PNGs."""
        images, _ = self._prep_image(image_path)
        n = len(G.INSTRUCTIONS)
        batch = jnp.asarray(np.repeat(images, n, axis=0))
        exif_raw = exif_io.extract_exif(image_path)
        exif_one = exif_io.exif_arrays_for_model(exif_raw, self.camera_to_id)
        exif_j = {k: jnp.asarray(np.repeat(v, n, axis=0)) for k, v in exif_one.items()}
        out = self._guided(
            self.params, batch, exif_j, jnp.arange(n, dtype=jnp.int32),
            self._next_key(),
        )
        depths = np.asarray(out.depth).squeeze(-1)
        confs = np.asarray(out.confidence).squeeze(-1)
        attn = np.asarray(out.attention)
        results = {}
        for i, name in enumerate(G.INSTRUCTIONS):
            results[name] = (float(depths[i]), float(confs[i]))
            if self.save_images:
                save_prediction_image(
                    images[0], float(depths[i]), float(confs[i]), attn[i], name,
                    image_path, self.output_dir,
                )
        return results

    def predict_all_instructions_batch(
        self, image_paths: List[str]
    ) -> List[Dict[str, Tuple[float, float]]]:
        """Nine instructions x M images in ONE device call (batch M*9 with a
        tiled guidance-index vector). Returns one {instruction: (depth,
        confidence)} dict per image and writes the per-image prediction PNGs
        (the multi-image nine-grid path; the reference needs 9*M demo.py
        runs, ref:create_nine_grid_demo.py)."""
        n = len(G.INSTRUCTIONS)
        imgs, exifs = [], []
        for path in image_paths:
            img, _ = self._prep_image(path)
            imgs.append(np.repeat(img, n, axis=0))
            e = exif_io.exif_arrays_for_model(
                exif_io.extract_exif(path), self.camera_to_id
            )
            exifs.append({k: np.repeat(v, n, axis=0) for k, v in e.items()})
        batch = jnp.asarray(np.concatenate(imgs))
        exif_j = {
            k: jnp.asarray(np.concatenate([e[k] for e in exifs]))
            for k in exifs[0]
        }
        gi = jnp.asarray(np.tile(np.arange(n, dtype=np.int32), len(image_paths)))
        out = self._guided(self.params, batch, exif_j, gi, self._next_key())
        depths = np.asarray(out.depth).squeeze(-1)
        confs = np.asarray(out.confidence).squeeze(-1)
        attn = np.asarray(out.attention)
        results = []
        for m, path in enumerate(image_paths):
            per = {}
            for i, name in enumerate(G.INSTRUCTIONS):
                j = m * n + i
                per[name] = (float(depths[j]), float(confs[j]))
                if self.save_images:
                    save_prediction_image(
                        np.asarray(imgs[m][0]), float(depths[j]), float(confs[j]),
                        attn[j], name, path, self.output_dir,
                    )
            results.append(per)
        return results

    def predict_paths_batched(
        self,
        image_paths: List[str],
        instruction: Optional[str] = None,
        batch_size: int = 16,
        mesh=None,
        use_exif: bool = True,
        instructions: Optional[List[str]] = None,
    ) -> List[Tuple[float, float]]:
        """Production serving path: native C++ loader (threaded decode+resize,
        io/native) -> device batches, optionally DP-sharded over a mesh.
        Returns [(depth, confidence)] per path ((nan, nan) for failed decodes);
        skips per-image PNG artifacts. Host->device transfer is uint8 (4x
        smaller); /255 + ImageNet normalization fuses into the jitted forward.

        Per-image EXIF is extracted on the host (same plausibility ranges and
        defaults as predict(), ref:demo.py:170-296) so the batched path gives
        the same answers; pass use_exif=False to skip the PIL pass and use
        the 50mm/f2.8/ISO100 defaults for every image.

        `instructions` gives a per-path guidance instruction (mixed
        instructions batch into ONE guided dispatch — the guidance index is a
        traced per-image vector, so all 9 modes share the compiled graph);
        mutually exclusive with the scalar `instruction`. Every entry must be
        a valid instruction string: guided and unguided forwards are
        different graphs, so a None-mixed list can't share a dispatch — use
        predict_batch for that."""
        from cognitive_aim_tpu.io.native_loader import (
            decode_resize_batch_u8,
            decode_resize_batch_u8_exif,
            normalize_u8_on_device,
        )
        from cognitive_aim_tpu.parallel.sharding import shard_batch

        if not hasattr(self, "_guided_u8"):
            self._guided_u8 = jax.jit(
                lambda p, x, e, g, k: self.model.apply(
                    p, normalize_u8_on_device(x), e, guidance=g, rng=k,
                    noise_mode=self.noise_mode,
                )
            )
            self._unguided_u8 = jax.jit(
                lambda p, x, e, k: self.model.apply(
                    p, normalize_u8_on_device(x), e, rng=k,
                    noise_mode=self.noise_mode,
                )
            )

        if instructions is not None:
            if instruction is not None:
                raise ValueError("pass either instruction or instructions, not both")
            if len(instructions) != len(image_paths):
                raise ValueError("instructions must match image_paths length")
            gi_all = np.asarray(
                [G.instruction_index(i) for i in instructions], np.int32
            )
        else:
            gi_all = None
        gi = None if instruction is None else G.instruction_index(instruction)

        def _dispatch(chunk, start):
            """Host decode + async device dispatch for one chunk. Returns the
            un-fetched device outputs; JAX dispatch is asynchronous, so the
            device computes this chunk while the caller decodes the next.

            The tail chunk is padded to batch_size with repeat-last (as
            evaluate.py does) so EVERY chunk hits the same compiled graph —
            a bare odd-sized tail silently JIT-compiled a brand-new graph
            (minutes through the TPU relay) in production serving."""
            if use_exif:
                # one pass per file: the native loader returns pixels AND
                # the raw EXIF APP1 bytes together (a separate PIL re-open
                # per image doubled host I/O on the host-bound path)
                imgs, ok, payloads = decode_resize_batch_u8_exif(
                    chunk, self.image_size, self.image_size)
            else:
                imgs, ok = decode_resize_batch_u8(
                    chunk, self.image_size, self.image_size)
            n = len(chunk)
            pad = batch_size - n if n < batch_size else 0
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            if use_exif:
                per_image = [
                    exif_io.exif_arrays_for_model(
                        exif_io.extract_exif_from_app1(pl), self.camera_to_id
                    )
                    for pl in payloads
                ]
                exif = {
                    k: np.concatenate([e[k] for e in per_image])
                    for k in per_image[0]
                }
            else:
                exif = {
                    "camera_idx": np.zeros(n, np.int32),
                    "focal_length": np.full(n, 50.0, np.float32),
                    "aperture": np.full(n, 2.8, np.float32),
                    "iso": np.full(n, 100.0, np.float32),
                }
            if pad:
                exif = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                        for k, v in exif.items()}
            xb = jnp.asarray(imgs)
            eb = {k: jnp.asarray(v) for k, v in exif.items()}
            if mesh is not None:
                sharded = shard_batch(mesh, {"images": xb, **eb})
                xb = sharded["images"]
                eb = {k: sharded[k] for k in eb}
            if gi_all is not None:
                gvec = gi_all[start : start + n]
                if pad:
                    gvec = np.concatenate([gvec, np.repeat(gvec[-1:], pad)])
                out = self._guided_u8(
                    self.params, xb, eb, jnp.asarray(gvec), self._next_key(),
                )
            elif gi is not None:
                out = self._guided_u8(
                    self.params, xb, eb,
                    jnp.asarray(np.full(n + pad, gi, np.int32)),
                    self._next_key(),
                )
            else:
                out = self._unguided_u8(self.params, xb, eb, self._next_key())
            return out, ok, n

        def _drain(pend):
            out, ok, n = pend
            d = np.asarray(out.depth[:, 0])
            c = np.asarray(out.confidence[:, 0])
            return [
                (float(d[i]), float(c[i])) if ok[i] else (float("nan"), float("nan"))
                for i in range(n)
            ]

        # double-buffered: decode/dispatch chunk i+1 before fetching chunk i,
        # so the threaded C++ decode overlaps device compute
        results: List[Tuple[float, float]] = []
        pending = None
        for start in range(0, len(image_paths), batch_size):
            cur = _dispatch(image_paths[start : start + batch_size], start)
            if pending is not None:
                results.extend(_drain(pending))
            pending = cur
        if pending is not None:
            results.extend(_drain(pending))
        return results

    # ------------------------------------------------------------- misc ----
    def save_results(self, results: List[Tuple], output_path: str):
        """JSON writer with fraction handling (ref:demo.py:434-469)."""

        def make_serializable(obj):
            if hasattr(obj, "numerator") and hasattr(obj, "denominator"):
                return float(obj.numerator) / float(obj.denominator)
            if isinstance(obj, dict):
                return {k: make_serializable(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [make_serializable(v) for v in obj]
            try:
                json.dumps(obj)
                return obj
            except (TypeError, ValueError):
                return str(obj)

        serializable = [
            {
                "depth_value": float(d) if d is not None else None,
                "confidence_score": float(c) if c is not None else None,
                "metadata": make_serializable(m),
            }
            for d, c, m in results
        ]
        with open(output_path, "w", encoding="utf-8") as f:
            json.dump(serializable, f, indent=2, ensure_ascii=False)
        print(f"Results saved to: {output_path}")

    def get_exploration_stats(self):
        return self.model.get_exploration_stats()


# ------------------------------------------------------- flat npz pytrees ---
def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def npz_meta(npz) -> Dict[str, str]:
    """Provenance stamp read-back: '__meta__/<k>' string entries written
    next to the tensors (train_filter spec, adapter rank/targets). Empty
    dict for unstamped (pre-round-5) checkpoints."""
    meta = {}
    for key in getattr(npz, "files", []):
        if key.startswith("__meta__/"):
            meta[key[len("__meta__/"):]] = str(npz[key])
    return meta


def unflatten_npz(npz) -> Dict:
    """Rebuild a nested dict-of-dicts (lists become int-keyed dicts, which
    filter_and_merge matches by path). '__meta__/*' provenance entries
    (see npz_meta) are not parameters and are skipped."""
    tree: Dict = {}
    keys = npz.files if hasattr(npz, "files") else npz.keys()
    for key in keys:
        if key.startswith("__meta__/"):
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = npz[key]
    return _intify_lists(tree)


def _intify_lists(node):
    if isinstance(node, dict):
        if node and all(k.isdigit() for k in node):
            return [_intify_lists(node[k]) for k in sorted(node, key=int)]
        return {k: _intify_lists(v) for k, v in node.items()}
    return node
