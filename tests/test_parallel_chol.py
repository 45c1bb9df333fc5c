"""Distributed blocked Cholesky tests (8-virtual-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.parallel.distributed_chol import (
    distributed_cholesky,
    distributed_gp_solve,
)
from botorch_tpu.parallel.sharding import make_mesh

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _psd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)).astype(np.float32)
    return A @ A.T / n + np.eye(n, dtype=np.float32)


@needs_8
def test_distributed_cholesky_matches_dense():
    K = _psd(256)
    mesh = make_mesh(8)
    with mesh:
        L = distributed_cholesky(jnp.asarray(K), mesh)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(K), atol=5e-6
    )


@needs_8
def test_distributed_gp_solve():
    K = _psd(128, seed=1)
    y = np.random.default_rng(2).normal(size=128).astype(np.float32)
    mesh = make_mesh(8)
    with mesh:
        _, alpha = distributed_gp_solve(
            jnp.asarray(K), jnp.asarray(y), mesh, jitter=0.0
        )
    ref = np.linalg.solve(K, y)
    np.testing.assert_allclose(np.asarray(alpha), ref, rtol=5e-4, atol=5e-5)


@needs_8
def test_indivisible_n_raises():
    K = _psd(100)
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        with mesh:
            distributed_cholesky(jnp.asarray(K), mesh)
