"""Inference-engine tests (tiny backbone override for CPU speed): predict,
batched all-instructions, native checkpoint roundtrip, artifact filenames."""

import os

import numpy as np
import pytest
import yaml

from cognitive_aim_tpu.api import CognitiveAimInference
from cognitive_aim_tpu.models import guidance as G
from cognitive_aim_tpu.nn.dinov2 import DinoV2Config


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("api")
    cfg = {
        "cognitive_modules": ["ambient_stream", "iterative_focal_stream",
                              "exif_prior_database"],
        "dataset": {"image_size": 56},
        "exif_config": {"num_cameras": 5},
        "focal_config": {"num_iterations": 2},
    }
    cfg_path = str(d / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    vit = DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                       patch_size=14, pretrain_image_size=56)
    return CognitiveAimInference(
        cfg_path, None, noise_mode="zeros", output_dir=str(d / "demo_results"),
        vit_cfg=vit,
    ), d


@pytest.fixture(scope="module")
def image(tmp_path_factory):
    from PIL import Image

    p = str(tmp_path_factory.mktemp("img") / "photo.jpg")
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(100, 150, 3) * 255).astype(np.uint8)).save(p)
    return p


def test_predict_guided(engine, image):
    eng, d = engine
    depth, conf, meta = eng.predict(image, "center")
    assert depth > 0 and 0 <= conf <= 1
    assert meta["instruction"] == "center"
    assert meta["exif_source"] == "default"
    assert os.path.exists(d / "demo_results" / "photo_center_prediction.png")


def test_predict_unguided_deterministic(engine, image):
    eng, _ = engine
    d1, c1, _ = eng.predict(image)
    d2, c2, _ = eng.predict(image)
    assert d1 == d2 and c1 == c2  # noise_mode=zeros -> reproducible


def test_all_instructions_batched_matches_single(engine, image):
    eng, _ = engine
    nine = eng.predict_all_instructions(image)
    assert set(nine) == set(G.INSTRUCTIONS)
    d_center, c_center, _ = eng.predict(image, "center")
    np.testing.assert_allclose(nine["center"][0], d_center, rtol=1e-5)
    np.testing.assert_allclose(nine["center"][1], c_center, rtol=1e-5)


def test_native_checkpoint_roundtrip(engine, image, tmp_path):
    eng, _ = engine
    d1, _, _ = eng.predict(image, "left")
    ck = str(tmp_path / "params.npz")
    eng.save_native_checkpoint(ck)
    import jax

    old = eng.params
    eng.params = eng.model.init(jax.random.PRNGKey(123))
    d_random, _, _ = eng.predict(image, "left")
    assert d_random != d1
    eng.load_checkpoint(ck)
    d2, _, _ = eng.predict(image, "left")
    np.testing.assert_allclose(d2, d1, rtol=1e-6)
    eng.params = old


def test_predict_batch_error_entries(engine):
    eng, _ = engine
    results = eng.predict_batch(["/nonexistent.jpg"])
    assert results[0][0] is None and "error" in results[0][2]


def test_save_results_json(engine, image, tmp_path):
    eng, _ = engine
    results = eng.predict_batch([image], ["top-left"])
    out = str(tmp_path / "res.json")
    eng.save_results(results, out)
    import json

    data = json.load(open(out))
    assert data[0]["depth_value"] > 0
    assert data[0]["metadata"]["instruction"] == "top-left"


def test_predict_paths_batched(engine, image):
    eng, _ = engine
    res = eng.predict_paths_batched([image, image, "/nope.jpg"], "center",
                                    batch_size=2)
    assert len(res) == 3
    assert res[0] == res[1] and res[0][0] > 0
    assert np.isnan(res[2][0])


def test_predict_paths_batched_tail_pad_one_graph(engine, image):
    """An odd-sized tail chunk is padded to batch_size (repeat-last) so the
    whole run compiles exactly ONE graph — a bare tail used to JIT a second
    graph silently (minutes through the TPU relay in production)."""
    eng, _ = engine
    # fresh jitted entry points so the cache count starts at zero
    for attr in ("_guided_u8", "_unguided_u8"):
        if hasattr(eng, attr):
            delattr(eng, attr)
    res = eng.predict_paths_batched([image] * 5, "center", batch_size=2)
    assert len(res) == 5 and all(d > 0 for d, _ in res)
    assert eng._guided_u8._cache_size() == 1, "tail chunk recompiled"
    # tail answers must equal full-chunk answers (padding is inert)
    assert res[4] == res[0]
    # mixed-instruction and unguided paths pad too
    mixed = eng.predict_paths_batched([image] * 3, batch_size=2,
                                      instructions=["center"] * 3)
    assert eng._guided_u8._cache_size() == 1
    assert mixed[2] == mixed[0]
    eng.predict_paths_batched([image] * 3, batch_size=2)
    assert eng._unguided_u8._cache_size() == 1


def test_predict_paths_batched_mixed_instructions(engine, image):
    """Per-path instructions batch into one guided dispatch and match the
    same instruction passed as a scalar."""
    eng, _ = engine
    mixed = eng.predict_paths_batched([image, image], batch_size=2,
                                      instructions=["center", "top-left"])
    want_c = eng.predict_paths_batched([image], "center")[0]
    want_tl = eng.predict_paths_batched([image], "top-left")[0]
    np.testing.assert_allclose(mixed[0], want_c, rtol=1e-5)
    np.testing.assert_allclose(mixed[1], want_tl, rtol=1e-5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.predict_paths_batched([image], "center", instructions=["left"])
    with _pytest.raises(ValueError):
        eng.predict_paths_batched([image, image], instructions=["left"])


def test_all_instructions_batch_multi_image(engine, image):
    """9xM single-dispatch path agrees with the per-image nine-way call."""
    eng, _ = engine
    both = eng.predict_all_instructions_batch([image, image])
    single = eng.predict_all_instructions(image)
    assert len(both) == 2
    for name in G.INSTRUCTIONS:
        np.testing.assert_allclose(both[0][name], single[name], rtol=1e-5)
        np.testing.assert_allclose(both[1][name], both[0][name], rtol=1e-5)


def test_nine_grid_layout(engine, image, tmp_path):
    from cognitive_aim_tpu.utils.visualize import create_nine_grid_layout

    eng, d = engine
    eng.predict_all_instructions(image)
    out = create_nine_grid_layout(str(d / "demo_results"),
                                  str(tmp_path / "grid.png"), "photo")
    assert out is not None and os.path.getsize(out) > 10000
    # missing stem -> None (reference requires pre-generated PNGs,
    # ref:create_nine_grid_demo.py:36-58)
    assert create_nine_grid_layout(str(d / "demo_results"),
                                   str(tmp_path / "g2.png"), "nope") is None
