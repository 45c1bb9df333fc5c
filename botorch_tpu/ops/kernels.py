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
    # HIGHEST matmul precision is essential on TPU: the default routes f32
    # through the MXU as bf16, and the |x|^2+|z|^2-2xz cancellation then
    # destroys small distances (observed as large BO-regret degradation).
    xz = jnp.matmul(
        x, jnp.swapaxes(z, -1, -2),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
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


def categorical(x: Array, z: Array, lengthscale: Array) -> Array:
    """Hamming-distance categorical kernel
    `exp(-mean_d 1[x_d != z_d] / ls_d)` (reference
    `models/kernels/categorical.py:12`)."""
    neq = (
        jnp.abs(x[..., :, None, :] - z[..., None, :, :]) > 1e-6
    ).astype(x.dtype)
    return jnp.exp(-jnp.mean(neq / lengthscale[..., None, None, :], axis=-1))


def _masked_dims(d: int, dims: tuple):
    import numpy as _np

    mask = _np.zeros((d,), bool)
    mask[list(dims)] = True
    return jnp.asarray(mask)


def make_mixed(cat_dims: tuple):
    """Mixed continuous/categorical kernel (reference
    `models/gp_regression_mixed.py:28` `MixedSingleTaskGP`):
    `K = w_sum (k_cont + k_cat) + w_prod (k_cont * k_cat)` — a Matern-5/2
    over continuous dims and a Hamming kernel over categorical dims. The
    two mixture weights are the reference's learned ScaleKernel
    outputscales; with `weights=None` they default to 1/2 each."""

    def k(x, z, lengthscale, weights=None):
        d = x.shape[-1]
        cm = _masked_dims(d, cat_dims)
        # continuous part: give categorical dims huge lengthscale (no-op)
        ls_cont = jnp.where(cm, 1e6, lengthscale)
        k_cont = matern52(x, z, ls_cont)
        # categorical part over cat dims only
        ls_cat = jnp.where(cm, lengthscale, 1e6)
        neq = (jnp.abs(x[..., :, None, :] - z[..., None, :, :]) > 1e-6).astype(
            x.dtype
        )
        neq = jnp.where(cm, neq, 0.0)
        k_cat = jnp.exp(
            -jnp.sum(neq / ls_cat[..., None, None, :], axis=-1) / max(len(cat_dims), 1)
        )
        if weights is None:
            w_sum = w_prod = 0.5
        else:
            w_sum = weights[..., 0][..., None, None]
            w_prod = weights[..., 1][..., None, None]
        return w_sum * (k_cont + k_cat) + w_prod * k_cont * k_cat

    return k


def make_linear_truncated_fidelity(fidelity_dims: tuple):
    """Linear truncated fidelity kernel (reference
    `models/kernels/linear_truncated_fidelity.py:21`):
    `K = k_0(x, x') + c(s, s') k_1(x, x')` with the fidelity factor
    `c = (1 - s)(1 - s') (1 + s s')^p`, power `p` tied to the fidelity
    dim's lengthscale; `k_0, k_1` Matern-5/2 over the non-fidelity dims
    with shared ARD lengthscales (the reference learns two)."""

    def k(x, z, lengthscale):
        d = x.shape[-1]
        fm = _masked_dims(d, fidelity_dims)
        ls_x = jnp.where(fm, 1e6, lengthscale)
        kx = matern52(x, z, ls_x)
        c = jnp.ones_like(kx)
        for f in fidelity_dims:
            p = 1.0 + 1.0 / lengthscale[..., f]
            s1 = jnp.clip(x[..., :, f], 0.0, 1.0)
            s2 = jnp.clip(z[..., :, f], 0.0, 1.0)
            c = c * (
                (1.0 - s1)[..., :, None] * (1.0 - s2)[..., None, :]
                * jnp.power(
                    1.0 + s1[..., :, None] * s2[..., None, :],
                    p[..., None, None],
                )
            )
        return kx * (1.0 + c)

    return k


def make_fidelity(fidelity_dims: tuple):
    """Multi-fidelity product kernel (reference
    `models/gp_regression_fidelity.py:51` `SingleTaskMultiFidelityGP` with
    downsampling-style fidelity factors, `models/kernels/downsampling.py:18`):
    `K = Matern52(x_nonfid) * prod_f [c_f + ((1-s)(1-s'))^(1+p_f)]` with
    the per-fidelity exponent tied to that dim's lengthscale."""

    def k(x, z, lengthscale):
        d = x.shape[-1]
        fm = _masked_dims(d, fidelity_dims)
        ls_x = jnp.where(fm, 1e6, lengthscale)
        kx = matern52(x, z, ls_x)
        kf = jnp.ones_like(kx)
        for f in fidelity_dims:
            power = 1.0 + 1.0 / lengthscale[..., f]
            a = jnp.clip(1.0 - x[..., :, f], 0.0, 1.0)
            b = jnp.clip(1.0 - z[..., :, f], 0.0, 1.0)
            prod = a[..., :, None] * b[..., None, :]
            kf = kf * (0.5 + jnp.power(prod, power[..., None, None]))
        return kx * kf

    return k


def exponential_decay(x: Array, z: Array, lengthscale: Array) -> Array:
    """Exponential-decay kernel over non-negative inputs (reference
    `models/kernels/exponential_decay.py:18`):
    `k(x, z) = beta^alpha / (x + z + beta)^alpha` with `beta` tied to the
    (single-dim) lengthscale and `alpha = 2` fixed."""
    beta = lengthscale[..., 0]
    alpha = 2.0
    s_ = x[..., :, 0][..., :, None] + z[..., :, 0][..., None, :]
    return jnp.power(beta[..., None, None] / (s_ + beta[..., None, None]), alpha)


def infinite_width_bnn(x: Array, z: Array, lengthscale: Array, depth: int = 3) -> Array:
    """Infinite-width BNN (arccos/NNGP) kernel (reference
    `models/kernels/infinite_width_bnn.py:17`): `depth` ReLU layers with
    unit weight/bias variances, inputs scaled by ARD lengthscales."""
    xs, zs = _scale(x, lengthscale), _scale(z, lengthscale)
    hp = jax.lax.Precision.HIGHEST
    Kxz = 1.0 + jnp.matmul(xs, jnp.swapaxes(zs, -1, -2), precision=hp)
    Kxx = 1.0 + jnp.sum(jnp.square(xs), -1)
    Kzz = 1.0 + jnp.sum(jnp.square(zs), -1)
    for _ in range(depth):
        norm = jnp.sqrt(Kxx[..., :, None] * Kzz[..., None, :])
        c = jnp.clip(Kxz / norm, -1.0, 1.0)
        theta = jnp.arccos(c)
        # arc-cosine order-1 (ReLU) layer recursion
        Kxz = norm / (2 * jnp.pi) * (jnp.sin(theta) + (jnp.pi - theta) * c)
        Kxx = Kxx / 2.0
        Kzz = Kzz / 2.0
    return Kxz


def matern52_kernel(X: Array, lengthscale: Array) -> Array:
    """Matern-5/2 Gram matrix of `X` with itself — the reference's
    standalone helper used by the SAAS pyro model
    (`models/fully_bayesian.py:81-91`)."""
    return matern52(X, X, lengthscale)


KERNELS = {
    "rbf": rbf,
    "matern52": matern52,
    "matern32": matern32,
    "matern12": matern12,
    "categorical": categorical,
    "exponential_decay": exponential_decay,
    "infinite_width_bnn": infinite_width_bnn,
}




def make_oak(second_order: bool = False, quad_points: int = 32):
    """Orthogonal additive kernel (reference
    `models/kernels/orthogonal_additive_kernel.py:20`, [Lu2022oak]):
    per-dimension RBF components made orthogonal to constants on [0, 1]
    via Gauss-Legendre quadrature, summed additively with learned
    per-component coefficients (the reference's `coeffs_1`), optionally
    with second-order interaction products weighted by learned pairwise
    coefficients (`coeffs_2`). With `weights=None` all first-order
    coefficients default to `1/d` (and second-order to `1/d^2`).

    Weight layout (trailing axis): `d` first-order coefficients, then the
    `d (d - 1) / 2` upper-triangle second-order coefficients (row-major
    over pairs `i < j`) when `second_order`.
    """
    import numpy as _np

    gx, gw = _np.polynomial.legendre.leggauss(quad_points)
    gx = jnp.asarray((gx + 1.0) / 2.0, jnp.float32)  # nodes on [0, 1]
    gw = jnp.asarray(gw / 2.0, jnp.float32)

    def k(x, z, lengthscale, weights=None):
        def k1(a, b, ls):
            # 1-d RBF: a (..., n), b (..., m) -> (..., n, m)
            d = a[..., :, None] - b[..., None, :]
            return jnp.exp(-0.5 * jnp.square(d / ls))

        d_dims = x.shape[-1]
        total = 0.0
        comps = []
        for dim in range(d_dims):
            ls = lengthscale[..., dim]
            kd = k1(x[..., dim], z[..., dim], ls)
            Sx = jnp.sum(gw * k1(x[..., dim], gx, ls), axis=-1)  # (..., n)
            Sz = jnp.sum(gw * k1(z[..., dim], gx, ls), axis=-1)  # (..., m)
            M = jnp.sum(gw[:, None] * gw[None, :] * k1(gx, gx, ls))
            kt = kd - Sx[..., :, None] - Sz[..., None, :] + M
            comps.append(kt)
            w1 = (
                1.0 / d_dims
                if weights is None
                else weights[..., dim][..., None, None]
            )
            total = total + w1 * kt
        if second_order:
            pair_idx = d_dims
            for i in range(d_dims):
                for j in range(i + 1, d_dims):
                    w2 = (
                        1.0 / (d_dims * d_dims)
                        if weights is None
                        else weights[..., pair_idx][..., None, None]
                    )
                    total = total + w2 * comps[i] * comps[j]
                    pair_idx += 1
        return total

    return k


def kernel_num_weights(name: str, d: int) -> int:
    """Number of learned mixture weights a kernel carries beyond ARD
    lengthscales (0 for plain kernels). These live in
    `GPParams.raw_kernel_weights`."""
    if name.startswith("mixed:"):
        return 2
    if name == "oak":
        return d
    if name == "oak2":
        return d + d * (d - 1) // 2
    return 0


def kernel_default_raw_weights(name: str, d: int):
    """Default (log-space) kernel weights reproducing the unweighted
    behavior, or `None` for kernels without weights."""
    import numpy as _np

    w = kernel_num_weights(name, d)
    if w == 0:
        return None
    if name.startswith("mixed:"):
        return jnp.asarray(_np.log([0.5, 0.5]), jnp.float32)
    vals = _np.full((w,), 1.0 / (d * d))
    vals[:d] = 1.0 / d
    return jnp.asarray(_np.log(vals), jnp.float32)


# Stationary kernels with a fused Pallas TPU path (`ops/pallas_kernels`).
# Measured on v5e (4096x4096, d=8): matern52 1.02 ms Pallas vs 1.95 ms XLA
# (the sqrt+exp epilogue fuses better in VMEM); rbf 0.95 vs 0.71 — XLA wins
# because rbf's cheap epilogue doesn't amortize the d->128 lane padding,
# so rbf stays on the XLA path.
_PALLAS_ELIGIBLE = ("matern52", "matern32", "matern12")
# Below this many output elements the 128x128 tile padding costs more than
# the fused kernel saves; XLA's own fusion wins on small matrices.
_PALLAS_MIN_ELEMENTS = 256 * 256


def _pallas_dispatching(name: str):
    raw = KERNELS[name]

    def dispatch(x, z, lengthscale):
        if (
            x.ndim == 2
            and z.ndim == 2
            and lengthscale.ndim == 1
            and x.dtype == jnp.float32
            and x.shape[0] * z.shape[0] >= _PALLAS_MIN_ELEMENTS
        ):
            import jax as _jax

            if _jax.default_backend() == "tpu":
                from botorch_tpu.ops import pallas_kernels

                return pallas_kernels._PALLAS_OPS[name](x, z, lengthscale)
        return raw(x, z, lengthscale)

    return dispatch


_DISPATCHING = None


def kernel_fn(name: str):
    """Look up a kernel by name. Composite kernels are encoded as
    `"mixed:<i>,<j>"` (categorical dims) or `"fidelity:<i>"` (fidelity
    dims) so they remain hashable static model fields.

    The stationary kernels route through the fused Pallas TPU op for
    large unbatched matrices (`ops/pallas_kernels.kernel_matrix`
    dispatch rule); everything else is the jnp/XLA implementation."""
    global _DISPATCHING
    if _DISPATCHING is None:
        _DISPATCHING = {k: _pallas_dispatching(k) for k in _PALLAS_ELIGIBLE}
    if name in _DISPATCHING:
        return _DISPATCHING[name]
    if name in KERNELS:
        return KERNELS[name]
    if name.startswith("mixed:"):
        dims = tuple(int(s) for s in name.split(":", 1)[1].split(",") if s)
        return make_mixed(dims)
    if name.startswith("fidelity:"):
        dims = tuple(int(s) for s in name.split(":", 1)[1].split(",") if s)
        return make_fidelity(dims)
    if name.startswith("lin_trunc_fidelity:"):
        dims = tuple(int(s) for s in name.split(":", 1)[1].split(",") if s)
        return make_linear_truncated_fidelity(dims)
    if name == "oak":
        return make_oak(second_order=False)
    if name == "oak2":
        return make_oak(second_order=True)
    raise ValueError(f"Unknown kernel {name!r}; have {sorted(KERNELS)}")
