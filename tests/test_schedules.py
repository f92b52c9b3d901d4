"""Config-declared schedules: KL beta (constant/linear/cosine) and
weight-decay; kl_weight threading through the curiosity module."""

import numpy as np

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.models import curiosity as C
from cognitive_aim_tpu.core.rng import NoiseMode
from cognitive_aim_tpu.train.schedules import beta_schedule


def test_beta_schedules():
    f = beta_schedule("constant", 0.05, 1.5, 10)
    assert f(0) == 1.5 and f(9) == 1.5
    f = beta_schedule("linear", 0.0, 1.0, 11)
    np.testing.assert_allclose(f(0), 0.0)
    np.testing.assert_allclose(f(5), 0.5)
    np.testing.assert_allclose(f(10), 1.0)
    f = beta_schedule("cosine", 0.05, 1.5, 5)
    assert abs(f(0) - 0.05) < 1e-9 and abs(f(4) - 1.5) < 1e-9
    assert f(0) < f(1) < f(2) < f(3) < f(4)


def test_kl_weight_threads_through_curiosity():
    params = C.curiosity_init(jax.random.PRNGKey(0), 64, 32, True)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 64), jnp.float32)
    r1, u1, c1 = C.curiosity_apply(params, x, kl_weight=0.0,
                                   noise_mode=NoiseMode.ZEROS)
    r2, u2, c2 = C.curiosity_apply(params, x, kl_weight=5.0,
                                   noise_mode=NoiseMode.ZEROS)
    assert np.all(np.asarray(u2) >= np.asarray(u1))
    assert np.abs(np.asarray(u2) - np.asarray(u1)).max() > 0
