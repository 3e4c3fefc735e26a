"""Pallas bilateral pass vs the XLA reference implementation."""

import jax.numpy as jnp
import numpy as np

from dxrexperiments_tpu.models.denoise import _bilateral_pass
from dxrexperiments_tpu.ops.bilateral_pallas import bilateral_pass


def _data(h=40, w=52, seed=0):
    rs = np.random.default_rng(seed)
    inp = rs.uniform(0, 1, (h, w, 3)).astype(np.float32)
    guide = np.zeros((h, w, 3), np.float32)
    guide[:, w // 2 :] = 0.8  # an edge for the joint term
    guide += rs.uniform(0, 0.05, (h, w, 3)).astype(np.float32)
    return jnp.asarray(inp), jnp.asarray(guide)


def test_horizontal_matches_reference():
    inp, guide = _data()
    radius = jnp.asarray(12.0)
    ref = np.asarray(_bilateral_pass(inp, guide, radius, axis=1))
    got = np.asarray(bilateral_pass(inp, guide, radius, axis=1, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_vertical_matches_reference():
    inp, guide = _data(seed=3)
    radius = jnp.asarray(7.0)
    ref = np.asarray(_bilateral_pass(inp, guide, radius, axis=0))
    got = np.asarray(bilateral_pass(inp, guide, radius, axis=0, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_small_radius():
    inp, guide = _data(seed=5)
    radius = jnp.asarray(1.0)
    ref = np.asarray(_bilateral_pass(inp, guide, radius, axis=1))
    got = np.asarray(bilateral_pass(inp, guide, radius, axis=1, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
