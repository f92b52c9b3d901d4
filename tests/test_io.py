"""IO tier: dataset pipeline, EXIF normalization vs the reference, engine
checkpoint roundtrip through the npz format."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "depths").mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(60, 80, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"im{i}.jpg"
        )
        np.save(root / "depths" / f"im{i}_depth.npy",
                rng.rand(30, 40).astype(np.float32) * 4 + 1)
    return str(root)


def test_dataset_scan_and_item(data_dir):
    from cognitive_aim_tpu.io.dataset import DepthDataset

    ds = DepthDataset(data_dir, "train", (56, 56), use_exif=True, augment=False)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (56, 56, 3)
    assert s["depth"].shape == (56, 56)
    # min-max normalized to [0,1] (ref:src/dataset.py:181)
    assert 0.0 <= s["depth"].min() and s["depth"].max() <= 1.0 + 1e-6
    assert abs(s["depth"].max() - 1.0) < 1e-5
    assert "exif" in s and "camera_idx" in s["exif"]


def test_dataset_annotations_json(data_dir):
    from cognitive_aim_tpu.io.dataset import DepthDataset

    anns = [
        {"image_path": os.path.join(data_dir, "images", "im0.jpg"),
         "image_id": 7}
    ]
    with open(os.path.join(data_dir, "val_annotations.json"), "w") as f:
        json.dump(anns, f)
    ds = DepthDataset(data_dir, "val", (32, 32), use_exif=False)
    assert len(ds) == 1
    s = ds[0]
    assert s["image_id"] == 7
    assert np.all(s["depth"] == 0)  # dummy depth when absent (ref:184)


def test_loader_batching(data_dir):
    from cognitive_aim_tpu.io.dataset import DataLoader, DepthDataset

    ds = DepthDataset(data_dir, "train", (32, 32), use_exif=True, augment=True)
    dl = DataLoader(ds, batch_size=3, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 1  # 4 // 3 with drop_last
    b = batches[0]
    assert b["images"].shape == (3, 32, 32, 3)
    assert b["depths"].shape == (3, 32, 32)
    assert b["exif"]["camera_idx"].shape == (3,)


def test_exif_normalization_matches_reference_formulas():
    from cognitive_aim_tpu.io.exif import normalize_exif_dataset

    n = normalize_exif_dataset(
        {"focal_length": 85.0, "aperture": 4.0, "iso": 800.0,
         "camera_model": "X"},
        {"X": 3, "unknown": 5},
    )
    assert abs(n["focal_length"] - 85.0 / 200.0) < 1e-9
    assert abs(n["aperture"] - 4.0 / 22.0) < 1e-9
    assert abs(n["iso"] - 800.0 / 6400.0) < 1e-9
    assert n["camera_idx"] == 3
    # clamping (ref:src/dataset.py:146-148)
    n = normalize_exif_dataset({"focal_length": 999.0, "aperture": 0.5,
                                "iso": 10.0}, {"unknown": 0})
    assert n["focal_length"] == 1.0 and n["aperture"] == 1.0 / 22.0
    assert n["iso"] == 50.0 / 6400.0
    # defaults (ref:src/dataset.py:204-210)
    d = normalize_exif_dataset(None, {"unknown": 9})
    assert (d["focal_length"], d["aperture"], d["iso"]) == (0.25, 0.127, 0.016)
    assert d["camera_idx"] == 9


def test_exif_inference_defaults():
    from cognitive_aim_tpu.io.exif import exif_arrays_for_model

    a = exif_arrays_for_model(None)
    assert a["focal_length"][0] == 50.0 and a["aperture"][0] == 2.8
    assert a["iso"][0] == 100.0 and a["camera_idx"][0] == 0
    a = exif_arrays_for_model({"FocalLength": 35.0, "Model": "Y"}, {"Y": 2,
                                                                    "unknown": 0})
    assert a["focal_length"][0] == 35.0 and a["camera_idx"][0] == 2


def test_npz_checkpoint_roundtrip():
    import jax

    from cognitive_aim_tpu.api import flatten_tree, unflatten_npz
    from cognitive_aim_tpu.io.checkpoint_torch import filter_and_merge

    tree = {
        "a": {"w": np.ones((2, 3), np.float32)},
        "list": [{"x": np.zeros(4)}, {"x": np.ones(4)}],
    }
    np.savez("/tmp/rt.npz", **flatten_tree(tree))
    back = unflatten_npz(np.load("/tmp/rt.npz"))
    merged, loaded, skipped = filter_and_merge(tree, back)
    assert loaded == 3 and skipped == 0
    np.testing.assert_array_equal(merged["list"][1]["x"], tree["list"][1]["x"])


def test_prefetch_loader(data_dir):
    from cognitive_aim_tpu.io.dataset import DataLoader, DepthDataset, PrefetchLoader

    ds = DepthDataset(data_dir, "train", (32, 32), use_exif=False)
    base = DataLoader(ds, batch_size=2)
    pf = PrefetchLoader(base)
    assert len(pf) == len(base)
    batches = list(pf)
    assert sum(b["images"].shape[0] for b in batches) == len(ds)
