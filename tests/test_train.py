"""Training-step tests: loss parity vs the reference formulas, loss decreases
on a synthetic batch, checkpoint save/restore roundtrip, DP-sharded step on
the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.core.precision import STRICT_F32
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import ModelArchConfig
from cognitive_aim_tpu.nn.dinov2 import DinoV2Config
from cognitive_aim_tpu.train import losses as LS
from cognitive_aim_tpu.train.metrics import calculate_depth_metrics
from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer


def tiny_model(**arch_kw):
    arch = ModelArchConfig(
        num_iterations=2, focus_strength=0.1, num_cameras=4, image_size=28,
        freeze_backbone=False, **arch_kw,
    )
    vit = DinoV2Config(
        hidden_size=64, num_layers=2, num_heads=4, patch_size=14,
        pretrain_image_size=28,
    )
    model = CognitiveAimModel(arch, policy=STRICT_F32, vit_cfg=vit)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def synth_batch(B=8, size=28, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randn(B, size, size, 3).astype(np.float32) * 0.5,
        "depths": np.abs(rng.randn(B).astype(np.float32)) + 0.5,
        "exif": {
            "camera_idx": np.zeros(B, np.int32),
            "focal_length": np.full(B, 0.25, np.float32),
            "aperture": np.full(B, 0.127, np.float32),
            "iso": np.full(B, 0.016, np.float32),
        },
    }


# ------------------------------------------------------------ loss parity ---
def test_silog_matches_reference():
    import importlib
    import sys

    from conftest import REFERENCE_ROOT, import_reference_model

    import_reference_model()  # installs torchvision stub + sys.path
    sys.path.insert(0, REFERENCE_ROOT)
    ref_train = importlib.import_module("train")
    import torch

    pred = np.abs(np.random.RandomState(0).randn(16)).astype(np.float32) + 0.1
    target = np.abs(np.random.RandomState(1).randn(16)).astype(np.float32) + 0.1
    want = float(
        ref_train.ScaleInvariantLoss(0.5)(torch.tensor(pred), torch.tensor(target))
    )
    got = float(LS.scale_invariant_loss(jnp.asarray(pred), jnp.asarray(target), 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    cur = np.random.RandomState(2).rand(4, 6).astype(np.float32)
    err = np.random.RandomState(3).rand(4).astype(np.float32)
    want = float(ref_train.CuriosityLoss()(torch.tensor(cur), torch.tensor(err)))
    got = float(LS.curiosity_loss(jnp.asarray(cur), jnp.asarray(err)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_metrics_match_reference():
    from conftest import REFERENCE_ROOT, import_reference_model
    import importlib
    import sys

    import_reference_model()
    sys.path.insert(0, REFERENCE_ROOT)
    ref_utils = importlib.import_module("src.utils")
    import torch

    pred = np.abs(np.random.RandomState(0).randn(100)) + 0.05
    target = np.abs(np.random.RandomState(1).randn(100)) + 0.05
    want = ref_utils.calculate_depth_metrics(torch.tensor(pred), torch.tensor(target))
    got = calculate_depth_metrics(pred, target)
    for k in ("rmse", "mae", "delta_1", "delta_2", "delta_3", "rel_error", "log_error"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, err_msg=k)


# --------------------------------------------------------------- training ---
@pytest.fixture(scope="module")
def trained():
    model, params = tiny_model()
    cfg = TrainConfig(
        learning_rate=3e-3, epochs=1, batch_size=8, steps_per_epoch=30,
        freeze_backbone=False, weight_decay=0.0,
    )
    trainer = Trainer(model, params, cfg, output_dir="/tmp/cat_test_out")
    batch = synth_batch()
    losses = []
    for i in range(25):
        logs = trainer.train_step(batch, jax.random.PRNGKey(i))
        losses.append(logs["loss"])
    return trainer, losses


def test_loss_decreases(trained):
    _, losses = trained
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:3] + losses[-3:]


def test_checkpoint_roundtrip(trained):
    trainer, _ = trained
    trainer.save_checkpoint(is_best=True)
    model, params = tiny_model()
    cfg = TrainConfig(epochs=1, steps_per_epoch=30, freeze_backbone=False)
    t2 = Trainer(model, params, cfg, output_dir="/tmp/cat_test_out2")
    t2.load_checkpoint("/tmp/cat_test_out/model_best.npz")
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(t2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert t2.epoch == trainer.epoch + 1


def test_dp_sharded_step_runs():
    """8-virtual-device data-parallel step executes and params stay in sync."""
    assert jax.device_count() == 8
    model, params = tiny_model()
    cfg = TrainConfig(epochs=1, steps_per_epoch=5, freeze_backbone=False)
    trainer = Trainer(model, params, cfg, output_dir="/tmp/cat_test_dp")
    logs = trainer.train_step(synth_batch(B=16), jax.random.PRNGKey(0))
    assert np.isfinite(logs["loss"])


def test_guided_training_step_with_train_filter():
    """guided_training samples a random instruction per sample inside the
    jitted step; combined with token_filter_train the train-time kept set
    becomes guidance-conditioned (matching guided eval — the round-3
    unguided filter-aware grid regressed ring cells because train saw one
    unguided kept set while eval saw nine, docs/PERF.md)."""
    model, params = tiny_model(
        token_filter_layer=1, token_filter_keep=0.5, token_filter_train=True,
    )
    cfg = TrainConfig(
        learning_rate=3e-3, epochs=1, batch_size=8, steps_per_epoch=5,
        freeze_backbone=False, weight_decay=0.0, guided_training=True,
    )
    trainer = Trainer(model, params, cfg, output_dir="/tmp/cat_test_guided")
    batch = synth_batch()
    losses = [
        trainer.train_step(batch, jax.random.PRNGKey(i))["loss"]
        for i in range(6)
    ]
    assert all(np.isfinite(l) for l in losses), losses
    # params must actually move (gradients flow through the guided path)
    assert losses[-1] != losses[0]


def test_explicit_batch_guidance_wins_over_sampling():
    """An explicit batch['guidance'] (int32 [B] instruction indices paired
    with instruction-DEPENDENT labels, e.g. the aimed procedural law) must
    drive the forward directly and SKIP guided_training's per-step
    instruction sampling: with the same rng, a guided_training=True step
    and a guided_training=False step given the same explicit vector must
    produce bit-identical losses (the sampling branch would consume an
    rng split and a random instruction, shifting both)."""
    model, params = tiny_model()
    kw = dict(
        learning_rate=3e-3, epochs=1, batch_size=8, steps_per_epoch=5,
        freeze_backbone=False, weight_decay=0.0,
        curiosity_weight=0.0, curiosity_warmup_epochs=10,
    )
    batch = synth_batch()
    batch["guidance"] = np.arange(8, dtype=np.int32) % 9

    # each Trainer gets its OWN copy of the params: the jitted step
    # donates the param buffers, so sharing one pytree across trainers
    # would read deleted arrays on the second trainer's first step
    def fresh():
        return jax.tree.map(lambda a: jnp.array(a), params)

    cfg_on = TrainConfig(guided_training=True, **kw)
    cfg_off = TrainConfig(guided_training=False, **kw)
    tr_a = Trainer(model, fresh(), cfg_on, output_dir="/tmp/cat_test_bg_a")
    tr_b = Trainer(model, fresh(), cfg_off, output_dir="/tmp/cat_test_bg_b")
    la = tr_a.train_step(batch, jax.random.PRNGKey(0))["loss"]
    lb = tr_b.train_step(batch, jax.random.PRNGKey(0))["loss"]
    assert np.isfinite(la) and np.isfinite(lb)
    np.testing.assert_allclose(la, lb, rtol=1e-6)

    # and a DIFFERENT explicit guidance vector changes the loss (the
    # indices actually reach the guided forward)
    batch2 = dict(batch, guidance=(np.arange(8, dtype=np.int32) + 4) % 9)
    tr_c = Trainer(model, fresh(), cfg_on, output_dir="/tmp/cat_test_bg_c")
    lc = tr_c.train_step(batch2, jax.random.PRNGKey(0))["loss"]
    assert abs(lc - la) > 1e-9

    # without the explicit vector, guided_training samples instructions
    # from the step rng — removing it shifts the loss (the behavior the
    # explicit path overrides)
    nb = {k: v for k, v in batch.items() if k != "guidance"}
    tr_d = Trainer(model, fresh(), cfg_on, output_dir="/tmp/cat_test_bg_d")
    ld = tr_d.train_step(nb, jax.random.PRNGKey(0))["loss"]
    assert abs(ld - la) > 1e-9


def test_alternating_filter_training_step():
    """alt_model: filtered and exact variants trained on alternating steps
    (sandwich-style) so the weights stay native to both paths — always-on
    filter training sends the exact path off-distribution (measured,
    docs/PERF.md round-3 guided grid)."""
    f_model, params = tiny_model(
        token_filter_layer=1, token_filter_keep=0.5, token_filter_train=True,
    )
    e_model, _ = tiny_model()
    cfg = TrainConfig(
        learning_rate=3e-3, epochs=1, batch_size=8, steps_per_epoch=6,
        freeze_backbone=False, weight_decay=0.0, guided_training=True,
    )
    trainer = Trainer(f_model, params, cfg, output_dir="/tmp/cat_test_alt",
                      alt_model=e_model)
    assert trainer._alt_step_fn is not None
    batch = synth_batch()
    losses = [
        trainer.train_step(batch, jax.random.PRNGKey(i))["loss"]
        for i in range(4)
    ]
    assert all(np.isfinite(l) for l in losses), losses


def test_run_training_honors_alternation_schedule():
    """scripts/train_synth_ckpt.run_training drives the compiled steps
    directly (bypassing Trainer.train_step), so it must replicate the
    alternating-variant schedule itself — a round-3 bug trained an
    'alternate' cell identical to the always-on one because the loop only
    ever called _step_fn."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from train_synth_ckpt import run_training

    calls = []

    class FakeTrainer:
        params, opt_state = {}, {}
        _step_fn = staticmethod(
            lambda p, o, b, k, c, w: (calls.append("main") or
                                      (p, o, {"loss": np.float32(1.0)})))
        _alt_step_fn = staticmethod(
            lambda p, o, b, k, c, w: (calls.append("alt") or
                                      (p, o, {"loss": np.float32(1.0)})))

    run_training(FakeTrainer(), [None], 4, log_every=100)
    assert calls == ["main", "alt", "main", "alt"]


def test_frozen_backbone_keeps_backbone_params():
    model, params = tiny_model()
    cfg = TrainConfig(
        learning_rate=1e-2, epochs=1, steps_per_epoch=5, freeze_backbone=True,
        weight_decay=0.0,
    )
    trainer = Trainer(model, params, cfg, output_dir="/tmp/cat_test_frz")
    before = np.asarray(
        jax.tree_util.tree_leaves(trainer.params["backbone"])[0]
    ).copy()
    before_head = np.asarray(trainer.params["fusion"]["fc0"]["w"]).copy()
    trainer.train_step(synth_batch(), jax.random.PRNGKey(0))
    after = np.asarray(jax.tree_util.tree_leaves(trainer.params["backbone"])[0])
    after_head = np.asarray(trainer.params["fusion"]["fc0"]["w"])
    np.testing.assert_array_equal(before, after)
    assert np.abs(after_head - before_head).max() > 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    model, params = tiny_model()
    cfg = TrainConfig(epochs=1, steps_per_epoch=5, freeze_backbone=False)
    t1 = Trainer(model, params, cfg, output_dir=str(tmp_path))
    t1.train_step(synth_batch(), jax.random.PRNGKey(0))
    t1.save_checkpoint_orbax(str(tmp_path / "orbax_ckpt"))
    model2, params2 = tiny_model()
    t2 = Trainer(model2, params2, cfg, output_dir=str(tmp_path / "o2"))
    t2.load_checkpoint_orbax(str(tmp_path / "orbax_ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sharding-aware restore: leaves land directly in their mesh sharding
    from cognitive_aim_tpu.parallel.sharding import param_shardings

    want = jax.tree_util.tree_leaves(
        param_shardings(t2.mesh, t2.params, cfg.tensor_parallel))
    for leaf, sh in zip(jax.tree_util.tree_leaves(t2.params), want):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim), (
            leaf.sharding, sh)


def test_elastic_orbax_restore_across_mesh_sizes(tmp_path):
    """Fleets resize: an Orbax checkpoint written on the 8-device mesh must
    restore — leaves resharded into the NEW mesh's shardings by the
    abstract-target restore (trainer.load_checkpoint_orbax) — and continue
    training on 4-, 2-, and 1-device meshes. Also round-trips npz<->Orbax
    across mesh sizes (the portable and the production format must agree
    bit-for-bit)."""
    from cognitive_aim_tpu.core.mesh import make_mesh
    from cognitive_aim_tpu.parallel.sharding import param_shardings

    assert jax.device_count() == 8
    model, params = tiny_model()
    cfg = TrainConfig(epochs=1, steps_per_epoch=5, freeze_backbone=False)
    t8 = Trainer(model, params, cfg, output_dir=str(tmp_path / "o8"))
    t8.train_step(synth_batch(B=16), jax.random.PRNGKey(0))
    t8.save_checkpoint_orbax(str(tmp_path / "ck"))
    want = [np.asarray(x) for x in jax.tree_util.tree_leaves(t8.params)]

    small = None
    for n in (4, 2, 1):
        mesh = make_mesh(jax.devices()[:n])
        m2, p2 = tiny_model()
        t = Trainer(m2, p2, cfg, mesh=mesh,
                    output_dir=str(tmp_path / f"o{n}"))
        t.load_checkpoint_orbax(str(tmp_path / "ck"))
        for a, b in zip(want, jax.tree_util.tree_leaves(t.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
        # restored leaves sit in the NEW mesh's shardings
        shs = jax.tree_util.tree_leaves(
            param_shardings(t.mesh, t.params, cfg.tensor_parallel))
        for leaf, sh in zip(jax.tree_util.tree_leaves(t.params), shs):
            assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
        logs = t.train_step(synth_batch(B=8), jax.random.PRNGKey(1))
        assert np.isfinite(logs["loss"])
        if n == 1:
            small = t

    # npz written from the 1-device trainer (pre-step state was mutated by
    # train_step, so save fresh) loads back onto the 8-device mesh
    small.save_checkpoint(is_best=False, filename="elastic.npz")
    m3, p3 = tiny_model()
    t8b = Trainer(m3, p3, cfg, output_dir=str(tmp_path / "o8b"))
    t8b.load_checkpoint(str(tmp_path / "o1" / "elastic.npz"))
    for a, b in zip(jax.tree_util.tree_leaves(small.params),
                    jax.tree_util.tree_leaves(t8b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_torch_checkpoint(tmp_path):
    """--resume with a reference-format .pth restores model params."""
    import torch

    from conftest import import_reference_model

    ref = import_reference_model()
    torch.manual_seed(0)
    tm_ambient = ref.AmbientStream(64).eval()
    sd = {f"ambient_stream.{k}": v for k, v in tm_ambient.state_dict().items()}
    path = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": sd}, path)

    model, params = tiny_model()
    cfg = TrainConfig(epochs=1, steps_per_epoch=5, freeze_backbone=False)
    t = Trainer(model, params, cfg, output_dir=str(tmp_path))
    before = np.asarray(t.params["ambient_stream"]["mlp"]["fc0"]["w"]).copy()
    t.load_checkpoint(path)
    after = np.asarray(t.params["ambient_stream"]["mlp"]["fc0"]["w"])
    want = tm_ambient.state_dict()["mlp.0.weight"].numpy().T
    np.testing.assert_allclose(after, want, atol=1e-6)
    assert np.abs(after - before).max() > 0


def test_rich_logging_surface():
    """configs' logging.curiosity block (declared in experiment_B.yaml,
    unimplemented in the reference): attention heatmap images + curiosity
    statistics + exploration stats reach the writer at validation."""

    class FakeWriter:
        def __init__(self):
            self.scalars = {}
            self.images = {}

        def add_scalar(self, tag, value, step):
            self.scalars[tag] = value

        def add_image(self, tag, img, step):
            self.images[tag] = img

    model, params = tiny_model()
    cfg = TrainConfig(
        epochs=1, batch_size=8, steps_per_epoch=2, freeze_backbone=False,
        rich_logging=True, num_save_images=2, eval_noise_mode="zeros",
    )
    writer = FakeWriter()
    trainer = Trainer(model, params, cfg, output_dir="/tmp/cat_richlog",
                      writer=writer)

    class Loader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    loader = Loader([synth_batch(B=8)])
    trainer.fit(loader, loader, epochs=1)
    assert "Val/curiosity_mean" in writer.scalars
    assert "Val/curiosity_std" in writer.scalars
    assert "Val/AttentionHeatmap/0" in writer.images
    assert "Val/AttentionHeatmap/1" in writer.images
    img = writer.images["Val/AttentionHeatmap/0"]
    assert img.ndim == 3 and img.shape[0] == 1  # CHW grayscale
    assert float(img.max()) <= 1.0 and float(img.min()) >= 0.0
    assert "Exploration/mean" in writer.scalars
    assert writer.scalars["Exploration/samples"] >= 8


def test_from_raw_rich_logging_and_noise():
    raw = {
        "logging": {"curiosity": {"log_curiosity_stats": True},
                    "num_save_images": 3},
        "validation": {"noise_mode": "zeros"},
    }
    cfg = TrainConfig.from_raw(raw)
    assert cfg.rich_logging and cfg.num_save_images == 3
    assert cfg.eval_noise_mode == "zeros"
    cfg2 = TrainConfig.from_raw({})
    assert not cfg2.rich_logging and cfg2.eval_noise_mode == "sample"
    assert not cfg2.guided_training
    cfg3 = TrainConfig.from_raw({"training": {"guided_training": True}})
    assert cfg3.guided_training
