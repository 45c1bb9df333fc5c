r"""Pallas TPU kernels for the hot compute path.

Fused ARD kernel-matrix construction: scale-by-lengthscale, pairwise
squared distance (one MXU contraction), and the Matern/RBF epilogue all
happen in VMEM on 128x128 tiles — no HBM round-trip for the scaled inputs
or the raw distance matrix. This is the Pallas replacement for the
reference's gpytorch kernel + ATen matmul pipeline (SURVEY §2.9: "Pallas
fused distance+matern kernel construction").

Differentiability: `pallas_call` has no automatic VJP, so the op carries a
`custom_vjp` whose backward pass is the XLA autodiff of the reference jnp
implementation (`ops/kernels.py`) — forward runs the hand-written kernel,
backward runs fused XLA. Forward/backward agree to float32 roundoff.

The op is used automatically on TPU backends (`kernel_matrix` dispatch);
on CPU it falls back to the jnp implementation (Pallas interpret mode is
too slow for production paths).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from botorch_tpu.ops import kernels as jnp_kernels

Array = jax.Array

_TILE = 128
_sqrt5 = math.sqrt(5.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_body(kind: str):
    def body(x_ref, z_ref, inv_ls_ref, out_ref):
        # x: (TM, D), z: (TN, D), inv_ls: (1, D) — all VMEM resident.
        inv_ls = inv_ls_ref[0, :]
        xs = x_ref[:, :] * inv_ls
        zs = z_ref[:, :] * inv_ls
        x2 = jnp.sum(xs * xs, axis=1, keepdims=True)  # (TM, 1)
        z2 = jnp.sum(zs * zs, axis=1, keepdims=True)  # (TN, 1)
        xz = jnp.dot(
            xs, zs.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.maximum(x2 + z2.T - 2.0 * xz, 0.0)
        if kind == "rbf":
            out_ref[:, :] = jnp.exp(-0.5 * d2)
        else:
            r = jnp.sqrt(d2)
            if kind == "matern52":
                sr = _sqrt5 * r
                out_ref[:, :] = (1.0 + sr + (5.0 / 3.0) * d2) * jnp.exp(-sr)
            elif kind == "matern32":
                sr = math.sqrt(3.0) * r
                out_ref[:, :] = (1.0 + sr) * jnp.exp(-sr)
            else:  # matern12
                out_ref[:, :] = jnp.exp(-r)

    return body


@functools.partial(jax.jit, static_argnames=("kind",))
def _pallas_kernel_matrix(x: Array, z: Array, lengthscale: Array, kind: str) -> Array:
    n, d = x.shape
    m = z.shape[0]
    n_p, m_p = _round_up(n, _TILE), _round_up(m, _TILE)
    d_p = _round_up(d, _TILE)
    # zero-pad: padded feature columns scale to 0 and contribute nothing;
    # padded rows produce garbage-free extra tiles that we slice off.
    xp = jnp.zeros((n_p, d_p), jnp.float32).at[:n, :d].set(x)
    zp = jnp.zeros((m_p, d_p), jnp.float32).at[:m, :d].set(z)
    inv = jnp.zeros((1, d_p), jnp.float32).at[0, :d].set(1.0 / lengthscale)

    out = pl.pallas_call(
        _kernel_body(kind),
        out_shape=jax.ShapeDtypeStruct((n_p, m_p), jnp.float32),
        grid=(n_p // _TILE, m_p // _TILE),
        in_specs=[
            pl.BlockSpec((_TILE, d_p), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d_p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * m_p * d_p + 8 * n_p * m_p,
            bytes_accessed=4 * (n_p * d_p + m_p * d_p + n_p * m_p),
            transcendentals=n_p * m_p,
        ),
    )(xp, zp, inv)
    return out[:n, :m]


def _make_op(kind: str):
    jnp_fn = jnp_kernels.KERNELS[kind]  # RAW impl (the dispatching
    # kernel_fn would recurse back into the Pallas op inside this VJP)

    @jax.custom_vjp
    def op(x, z, lengthscale):
        return _pallas_kernel_matrix(x, z, lengthscale, kind)

    def fwd(x, z, lengthscale):
        return op(x, z, lengthscale), (x, z, lengthscale)

    def bwd(res, g):
        _, vjp = jax.vjp(jnp_fn, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


_PALLAS_OPS = {k: _make_op(k) for k in ("rbf", "matern52", "matern32", "matern12")}


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def kernel_matrix(x: Array, z: Array, lengthscale: Array, kind: str) -> Array:
    """Fused kernel matrix: Pallas on TPU (unbatched paths), jnp/XLA
    otherwise. Drop-in for `ops.kernels.kernel_fn(kind)(x, z, ls)`."""
    if (
        pallas_available()
        and x.ndim == 2
        and z.ndim == 2
        and lengthscale.ndim == 1
        and x.dtype == jnp.float32
    ):
        return _PALLAS_OPS[kind](x, z, lengthscale)
    return jnp_kernels.kernel_fn(kind)(x, z, lengthscale)
