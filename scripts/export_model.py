"""AOT-export the guided serving forward as a serialized StableHLO artifact.

Production-serving path the reference lacks (its deploy story is
`demo.py` + eager torch, ref:demo.py:1-20): `jax.export` serializes the
jitted guided forward — model code, weights REFERENCED as arguments — into
a portable artifact a serving binary can load and run with no Python model
definition (jax.export.deserialize + .call), with the usual XLA
compatibility guarantees across jax releases.

    python scripts/export_model.py --out /tmp/cognitive_aim.stablehlo \
        [--config configs/experiment_B.yaml] [--checkpoint ckpt.pth]
        [--batch 16] [--policy int8] [--token-filter 2:0.25]

Writes <out> (serialized bytes) and <out>.params.npz (flat param arrays),
then round-trips: deserializes, re-runs on the same inputs, and checks the
depth output matches the live model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--config", type=str, default="configs/experiment_B.yaml")
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--policy", type=str, default="int8")
    ap.add_argument("--attn", type=str, default="pallas_packed")
    ap.add_argument("--token-filter", type=str, default="")
    ap.add_argument("--skip-roundtrip", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from cognitive_aim_tpu.api import CognitiveAimInference

    eng = CognitiveAimInference(
        args.config, args.checkpoint, policy=args.policy,
        attn_impl=args.attn, noise_mode="zeros", save_images=False,
        token_filter=args.token_filter,
    )
    B, S = args.batch, eng.image_size
    images = jnp.zeros((B, S, S, 3), jnp.float32)
    exif = {
        "camera_idx": jnp.zeros((B,), jnp.int32),
        "focal_length": jnp.full((B,), 50.0),
        "aperture": jnp.full((B,), 2.8),
        "iso": jnp.full((B,), 100.0),
    }
    gidx = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(0)

    # depth/confidence only: the serving contract (attention maps stay a
    # debug surface; exporting them would pin the [B, N] layout into the
    # artifact for no serving benefit)
    def serve(params, images, exif, gidx):
        out = eng.model.apply(params, images, exif, guidance=gidx, rng=key,
                              noise_mode=eng.noise_mode)
        return out.depth, out.confidence

    import time
    t0 = time.perf_counter()
    exported = jexport.export(jax.jit(serve))(
        eng.params, images, exif, gidx
    )
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"serialized in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    from cognitive_aim_tpu.api import flatten_tree, unflatten_npz

    # name-keyed flat npz (same format as save_native_checkpoint):
    # api.unflatten_npz rebuilds the exact params pytree rt.call expects,
    # so the artifact pair is self-contained — no Python model definition
    # needed on the consumer side
    flat = flatten_tree(eng.params)
    np.savez(args.out + ".params.npz", **flat)
    print(f"params fetched+saved in {time.perf_counter() - t0:.1f}s",
          flush=True)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB) + params.npz "
          f"({len(flat)} arrays); platform={exported.platforms}")

    if args.skip_roundtrip:
        return
    rt = jexport.deserialize(blob)
    # consumer-side reconstruction: npz -> pytree (no model definition)
    params_rt = unflatten_npz(np.load(args.out + ".params.npz"))
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.5)
    d0, c0 = jax.jit(serve)(eng.params, real, exif, gidx)
    d1, c1 = rt.call(params_rt, real, exif, gidx)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=2e-5,
                               atol=1e-6)
    print(f"roundtrip OK: deserialized artifact reproduces the live model "
          f"(depth[0]={float(d0[0, 0]):.5f})")


if __name__ == "__main__":
    main()
