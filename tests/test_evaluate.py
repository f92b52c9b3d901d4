"""evaluate.py: jitted eval path — one engine + one compiled graph serves the
per-instruction sweep; tail batches padded (no per-batch retraces)."""

import numpy as np
import pytest
import yaml

from cognitive_aim_tpu.nn.dinov2 import DinoV2Config

from evaluate import evaluate_config


@pytest.fixture(scope="module")
def val_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("valdata")
    (root / "images").mkdir()
    (root / "depths").mkdir()
    rng = np.random.RandomState(0)
    for i in range(5):  # 5 samples, batch 2 -> padded tail batch
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"im{i}.jpg"
        )
        np.save(root / "depths" / f"im{i}_depth.npy",
                rng.rand(16, 16).astype(np.float32) * 5 + 0.5)
    return str(root)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("evalcfg")
    cfg = {
        "cognitive_modules": ["ambient_stream", "iterative_focal_stream",
                              "exif_prior_database"],
        "dataset": {"image_size": 56},
        "exif_config": {"num_cameras": 5},
        "focal_config": {"num_iterations": 2},
        "validation": {"metrics": ["rmse", "abs_rel", "delta1"]},
    }
    p = str(d / "cfg.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def test_eval_sweep_one_engine(val_dir, tiny_cfg):
    vit = DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                       patch_size=14, pretrain_image_size=56)
    res = evaluate_config(tiny_cfg, val_dir, None, batch_size=2,
                          lookup="reference",
                          instructions=(None, "center", "top-left"),
                          vit_cfg=vit)
    assert set(res) == {None, "center", "top-left"}
    for instr, m in res.items():
        assert m["n"] == 5, m
        assert set(m) == {"rmse", "abs_rel", "delta1", "n", "mean_confidence"}
        assert np.isfinite(m["rmse"]) and np.isfinite(m["abs_rel"])
    # guided instructions must differ from unguided (guidance is live)
    assert res["center"]["rmse"] != res[None]["rmse"]
