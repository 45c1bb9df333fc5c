r"""GP covariance-kernel matrix construction, MXU-first.

The reference gets these from gpytorch's Python kernels on top of ATen C++
matmuls (`botorch/models/utils/gpytorch_modules.py`,
`botorch/models/fully_bayesian.py:81-91`). Here each kernel matrix is built
from one `x @ z^T` contraction (MXU) plus a VPU elementwise epilogue so XLA
fuses the whole construction; inputs are pre-scaled by ARD lengthscales.

All functions take `x: (..., n, d)`, `z: (..., m, d)` and broadcast over
leading batch dims (hyperparameter ensembles, multi-output batches, vmapped
restarts).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

_sqrt5 = math.sqrt(5.0)
_sqrt3 = math.sqrt(3.0)


def pairwise_sqdist(x: Array, z: Array) -> Array:
    """Squared Euclidean distance matrix `(..., n, m)`.

    `|x - z|^2 = |x|^2 + |z|^2 - 2 x.z` — one MXU matmul + rank-1 epilogue,
    clamped at zero against cancellation (important in float32).
    """
    x2 = jnp.sum(jnp.square(x), axis=-1)[..., :, None]
    z2 = jnp.sum(jnp.square(z), axis=-1)[..., None, :]
    xz = jnp.matmul(x, jnp.swapaxes(z, -1, -2), preferred_element_type=jnp.float32)
    return jnp.maximum(x2 + z2 - 2.0 * xz, 0.0)


def pairwise_dist(x: Array, z: Array) -> Array:
    """Euclidean distance with a custom-safe sqrt (zero gradient at 0)."""
    d2 = pairwise_sqdist(x, z)
    # sqrt has infinite grad at 0; guard so matern gradients stay finite on
    # the diagonal (same role as gpytorch's dist eps).
    safe = jnp.sqrt(jnp.where(d2 > 0, d2, 1.0))
    return jnp.where(d2 > 0, safe, 0.0)


def _scale(x: Array, lengthscale: Array) -> Array:
    """Divide points by ARD lengthscales, broadcasting hyperparameter batch
    dims: `x (..., n, d) / ls (..., d) -> (..., n, d)` with leading dims
    broadcast (ensemble/output batches)."""
    return x / lengthscale[..., None, :]


def rbf(x: Array, z: Array, lengthscale: Array) -> Array:
    """ARD RBF (squared-exponential) kernel matrix."""
    return jnp.exp(-0.5 * pairwise_sqdist(_scale(x, lengthscale), _scale(z, lengthscale)))


def matern52(x: Array, z: Array, lengthscale: Array) -> Array:
    """ARD Matern-5/2 kernel matrix (reference `fully_bayesian.py:81-91`)."""
    r = pairwise_dist(_scale(x, lengthscale), _scale(z, lengthscale))
    sr = _sqrt5 * r
    return (1.0 + sr + (5.0 / 3.0) * jnp.square(r)) * jnp.exp(-sr)


def matern32(x: Array, z: Array, lengthscale: Array) -> Array:
    """ARD Matern-3/2 kernel matrix."""
    r = pairwise_dist(_scale(x, lengthscale), _scale(z, lengthscale))
    sr = _sqrt3 * r
    return (1.0 + sr) * jnp.exp(-sr)


def matern12(x: Array, z: Array, lengthscale: Array) -> Array:
    """ARD Matern-1/2 (exponential) kernel matrix."""
    r = pairwise_dist(_scale(x, lengthscale), _scale(z, lengthscale))
    return jnp.exp(-r)


KERNELS = {
    "rbf": rbf,
    "matern52": matern52,
    "matern32": matern32,
    "matern12": matern12,
}


def kernel_fn(name: str):
    """Look up a kernel constructor by name (registry replaces gpytorch's
    class hierarchy)."""
    try:
        return KERNELS[name]
    except KeyError:
        raise ValueError(f"Unknown kernel {name!r}; have {sorted(KERNELS)}") from None
