"""Tests for the native scrambled Sobol engine (reference:
`torch.quasirandom.SobolEngine` usage in `botorch/sampling/qmc.py`,
`botorch/utils/sampling.py:66-139`)."""

import numpy as np
import jax.numpy as jnp
from scipy.stats import qmc

from botorch_tpu.sampling.sobol import (
    bits_to_unit,
    draw_sobol,
    draw_sobol_bits,
    draw_sobol_normal_samples,
    draw_sobol_samples,
    sobol_table,
)


def test_unscrambled_point_set_matches_scipy():
    for d in (1, 5, 13):
        sv, sh = sobol_table(d, scramble=False)
        mine = np.sort(np.asarray(draw_sobol(sv, sh, 32)), axis=0)
        ref = np.sort(qmc.Sobol(d=d, scramble=False).random(32), axis=0)
        np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_scrambled_uniformity_and_discrepancy():
    sv, sh = sobol_table(3, scramble=True, seed=7)
    x = np.asarray(draw_sobol(sv, sh, 4096))
    assert x.min() > 0 and x.max() < 1
    np.testing.assert_allclose(x.mean(0), 0.5, atol=2e-3)
    # separable integral: E[x1 x2 x3] = 1/8; qMC should nail it
    assert abs(x.prod(1).mean() - 0.125) < 1e-3


def test_different_seeds_differ():
    sv1, sh1 = sobol_table(2, scramble=True, seed=1)
    sv2, sh2 = sobol_table(2, scramble=True, seed=2)
    a = np.asarray(draw_sobol(sv1, sh1, 8))
    b = np.asarray(draw_sobol(sv2, sh2, 8))
    assert np.abs(a - b).max() > 0.01


def test_skip_continues_sequence():
    sv, sh = sobol_table(4, scramble=True, seed=0)
    full = np.asarray(draw_sobol_bits(sv, sh, 16))
    tail = np.asarray(draw_sobol_bits(sv, sh, 8, skip=8))
    np.testing.assert_array_equal(full[8:], tail)


def test_draw_sobol_samples_shapes_and_bounds():
    bounds = jnp.asarray([[0.0, -1.0], [2.0, 1.0]])
    X = draw_sobol_samples(bounds, n=16, q=3, seed=0)
    assert X.shape == (16, 3, 2)
    x = np.asarray(X)
    assert (x[..., 0] >= 0).all() and (x[..., 0] <= 2).all()
    assert (x[..., 1] >= -1).all() and (x[..., 1] <= 1).all()


def test_normal_qmc_moments():
    z = np.asarray(draw_sobol_normal_samples(4, 4096, seed=3))
    np.testing.assert_allclose(z.mean(0), 0.0, atol=5e-3)
    np.testing.assert_allclose(z.std(0), 1.0, atol=5e-3)
    # qMC normal should estimate E[max(z,0)] = 1/sqrt(2 pi) very accurately
    assert abs(np.maximum(z, 0).mean() - 1 / np.sqrt(2 * np.pi)) < 1e-3
