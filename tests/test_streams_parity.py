"""Module-level numerical parity vs the reference's torch modules
(imported from /root/reference and executed — never copied)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cognitive_aim_tpu.core.rng import NoiseMode  # noqa: E402
from cognitive_aim_tpu.io import checkpoint_torch as ct  # noqa: E402
from cognitive_aim_tpu.models import curiosity as C  # noqa: E402
from cognitive_aim_tpu.models import streams as S  # noqa: E402

from conftest import import_reference_model

ref = import_reference_model()


def sd_of(mod):
    return {f"m.{k}": v for k, v in mod.state_dict().items()}


def j(tree):
    return jax.tree.map(jnp.asarray, tree)


def test_ambient_parity():
    torch.manual_seed(0)
    m = ref.AmbientStream(768).eval()
    x = torch.randn(3, 768)
    with torch.no_grad():
        want = m(x).numpy()
    params = j(ct.convert_ambient(sd_of(m), "m"))
    got = np.asarray(S.ambient_apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("guided", [False, True])
def test_focal_parity(guided):
    torch.manual_seed(1)
    m = ref.FocalStream(768, curiosity_guided=guided).eval()
    x = torch.randn(2, 16, 768)  # 4x4 grid
    cur = torch.rand(2)
    with torch.no_grad():
        want_f, want_a = m(x, cur if guided else None)
    params = j(ct.convert_focal_stream(sd_of(m), "m"))
    got_f, got_a, ent = S.focal_apply(
        params, jnp.asarray(x.numpy()),
        jnp.asarray(cur.numpy()) if guided else None,
        curiosity_guided=guided, noise_mode=NoiseMode.ZEROS,
    )
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), atol=1e-5, rtol=1e-4)
    assert float(ent) == 0.0  # eval mode


@pytest.mark.parametrize("guided", [False, True])
@pytest.mark.parametrize("iters,strength", [(2, 0.1), (3, 1.5)])
def test_iterative_focal_parity(guided, iters, strength):
    torch.manual_seed(2)
    m = ref.IterativeFocalStream(
        768, num_iterations=iters, curiosity_guided=guided, focus_strength=strength
    ).eval()
    x = torch.randn(2, 16, 768)
    cur = torch.rand(2)
    with torch.no_grad():
        want_f, want_a = m(x, cur)
    params = j(ct.convert_iterative_focal(sd_of(m), "m"))
    got_f, got_a, _ = S.iterative_focal_apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(cur.numpy()),
        focus_strength=strength, curiosity_guided=guided,
        noise_mode=NoiseMode.ZEROS,
    )
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), atol=1e-5, rtol=1e-4)


def test_exif_prior_parity():
    torch.manual_seed(3)
    m = ref.EXIFPriorDatabase(num_cameras=7).eval()
    exif_t = {
        "camera_idx": torch.tensor([0, 3, 6]),
        "focal_length": torch.tensor([50.0, 24.0, 200.0]),
        "aperture": torch.tensor([2.8, 1.4, 8.0]),
        "iso": torch.tensor([100.0, 3200.0, 400.0]),
    }
    with torch.no_grad():
        want = m(exif_t).numpy()
    params = j(ct.convert_exif_prior(sd_of(m), "m"))
    exif_j = {k: jnp.asarray(v.numpy()) for k, v in exif_t.items()}
    got = np.asarray(S.exif_prior_apply(params, exif_j))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("hierarchical", [False, True])
@pytest.mark.parametrize("loss_type", ["simple", "robust", "huber"])
def test_curiosity_parity(monkeypatch, hierarchical, loss_type):
    torch.manual_seed(4)
    m = ref.CuriosityModule(768, hidden_dim=256, enable_hierarchical=hierarchical).eval()
    # zero all forward-time sampling in the reference
    monkeypatch.setattr(torch, "randn_like", lambda t, **kw: torch.zeros_like(t))
    x = torch.randn(3, 768)
    exif_t = {
        "focal_length": torch.tensor([50.0, 24.0, 200.0]),
        "aperture": torch.tensor([2.8, 1.4, 8.0]),
        "iso": torch.tensor([100.0, 3200.0, 400.0]),
    }
    with torch.no_grad():
        want_r, want_u, want_c = m(x, None, exif_t, loss_type, 0.1)
    params = j(ct.convert_curiosity(sd_of(m), "m"))
    exif_j = {k: jnp.asarray(v.numpy()) for k, v in exif_t.items()}
    got_r, got_u, got_c = C.curiosity_apply(
        params, jnp.asarray(x.numpy()), exif_j, loss_type=loss_type,
        uncertainty_weight=0.1, noise_mode=NoiseMode.ZEROS,
    )
    np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_u), want_u.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_c["kl_divergence"]), want_c["kl_divergence"].numpy(),
        atol=1e-5, rtol=1e-4,
    )


def test_curiosity_without_exif_geometric_is_half():
    torch.manual_seed(5)
    m = ref.CuriosityModule(768, enable_hierarchical=True).eval()
    params = j(ct.convert_curiosity(sd_of(m), "m"))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 768).astype(np.float32))
    _, _, comps = C.curiosity_apply(params, x, None, noise_mode=NoiseMode.ZEROS)
    np.testing.assert_allclose(np.asarray(comps["geometric_uncertainty"]), 0.5)


def test_exploration_history_matches_reference():
    m = ref.CuriosityModule(768, enable_hierarchical=True)
    h = C.ExplorationHistory()
    rewards = np.abs(np.random.RandomState(1).randn(40)).astype(np.float32)
    m._update_exploration_history(torch.tensor(rewards))
    h.update(rewards)
    want = m.get_exploration_statistics()
    got = h.statistics()
    for k in ("mean", "std", "max", "samples"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5)
