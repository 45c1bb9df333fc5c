r"""Pallas TPU batched small-matrix Cholesky / MVN log-density kernels.

XLA's `cholesky` and `triangular_solve` on TPU lower to sequential
column loops whose per-step latency dominates for the small matrices
this framework factorizes constantly (GP marginal likelihoods at n
tens-of-points, NUTS leapfrog potentials — SURVEY §3.1/§3.2 hot loops):
a batched (32, 24, 24) factorization costs ~200us even though it is
~10^5 FLOPs. This module replaces the whole
`cholesky -> solve -> quad/logdet` pipeline with ONE Pallas kernel in
a *batch-in-lanes* layout: matrices live as `(n, n, B)` tiles with the
batch on the 128-wide lane axis, so every step of the factorization is
a short vector op over all batch elements at once, and the n-step
recurrences are unrolled at trace time (n is static and small). This is
the "Pallas batched Cholesky" component of the north-star plan
(BASELINE.json; SURVEY §2.9 ATen Cholesky/TRSM row).

Public op:
  `mvn_quad_logdet(K, r) -> (quad, logdet)` with
    quad = r^T K^-1 r,  logdet = log |K|
  for K: (..., n, n) PSD (pre-jittered), r: (..., n). Differentiable via
  closed-form VJP (dquad/dK = -aa^T, dlogdet/dK = K^-1, dquad/dr = 2a
  with a = K^-1 r) — the backward pass is two outer products, no
  re-factorization. Batching: arbitrary leading dims are flattened into
  the lane axis; `jax.vmap` over the op is intercepted with a
  `custom_vmap` rule that maps the new axis into the same lane batch
  instead of lifting the kernel into a sequential grid.

Fallback: on non-TPU backends or n > _MAX_N the trace-time-unrolled
jnp implementation is used (identical semantics, still ~1.6x faster
than `jnp.linalg.cholesky` + `solve_triangular` on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
_MAX_N = 64  # unrolled recurrences: O(n^2) traced ops — cap compile cost


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------- #
# Kernel: (n_p, n_p, B) K-tile -> L, Linv, quad, logdet, alpha, Kinv
# all unrolled over the (static, small) matrix dimension; every op is a
# vector op over the B lanes.
# --------------------------------------------------------------------- #
def _qd_kernel_body(n_p: int):
    def body(k_ref, r_ref, quad_ref, logdet_ref, alpha_ref, linv_ref):
        # A stays SYMMETRIC through rank-1 downdates, so column j of the
        # trailing submatrix equals row j — only row slices (2-D tiles)
        # are ever taken; every intermediate is (n_p, B) or (1, B).
        A = k_ref[...]  # (n_p, n_p, B)
        r = r_ref[...]  # (n_p, B)
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (n_p, r.shape[-1]), 0
        )

        # ---- Cholesky (outer-product form, unrolled) ----
        cols = []  # cols[j] = L[:, j] as an (n_p, B) tile
        diag = []  # diag[j] = L[j, j] as a (1, B) tile
        for j in range(n_p):
            pivot_row = A[j]  # (n_p, B)
            d = jax.lax.rsqrt(pivot_row[j : j + 1])  # (1, B)
            col = pivot_row * d
            if j > 0:
                col = jnp.where(row_ids >= j, col, 0.0)
            cols.append(col)
            diag.append(col[j : j + 1])
            A = A - col[:, None, :] * col[None, :, :]

        # ---- Linv by forward substitution (rows, unrolled) ----
        # L X = I  =>  X[i] = (e_i - sum_{k<i} L[i, k] X[k]) / L[i, i]
        inv_rows = []
        for i in range(n_p):
            acc = (row_ids == i).astype(r.dtype)  # e_i over lanes
            for k in range(i):
                # L[i, k] = cols[k][i]
                acc = acc - cols[k][i : i + 1] * inv_rows[k]
            inv_rows.append(acc / diag[i])

        # ---- downstream products (2-D reductions only) ----
        w_rows = []  # w = Linv r
        quad = jnp.zeros((1, r.shape[-1]), r.dtype)
        ld = jnp.zeros((1, r.shape[-1]), r.dtype)
        alpha = jnp.zeros((n_p, r.shape[-1]), r.dtype)
        for i in range(n_p):
            w_i = jnp.sum(inv_rows[i] * r, axis=0, keepdims=True)  # (1, B)
            w_rows.append(w_i)
            quad = quad + w_i * w_i
            ld = ld + jnp.log(diag[i])
            alpha = alpha + inv_rows[i] * w_i  # alpha = Linv^T w

        quad_ref[...] = quad
        logdet_ref[...] = 2.0 * ld
        alpha_ref[...] = alpha
        linv_ref[...] = jnp.stack(inv_rows, axis=0)  # (n_p, n_p, B)

    return body


@functools.partial(jax.jit, static_argnames=("n",))
def _qd_pallas(K: Array, r: Array, n: int):
    """K: (B, n, n), r: (B, n) -> (quad (B,), logdet (B,), alpha (B, n),
    Kinv (B, n, n)). B and n are padded internally."""
    B = K.shape[0]
    B_p = _round_up(max(B, 1), _LANES)
    n_p = _round_up(n, 8)

    # pad: batch-pad with identity matrices, matrix-pad with identity
    # diagonal => chol well-defined, padded logdet contribution is 0.
    eye = jnp.eye(n_p, dtype=jnp.float32)
    Kp = jnp.tile(eye[None], (B_p, 1, 1))
    Kp = Kp.at[:B, :n, :n].set(K.astype(jnp.float32))
    rp = jnp.zeros((B_p, n_p), jnp.float32).at[:B, :n].set(
        r.astype(jnp.float32)
    )

    # batch-in-lanes layout
    K3 = jnp.transpose(Kp, (1, 2, 0))  # (n_p, n_p, B_p)
    r2 = jnp.transpose(rp, (1, 0))  # (n_p, B_p)

    grid = (B_p // _LANES,)
    quad, ld, alpha, linv = pl.pallas_call(
        _qd_kernel_body(n_p),
        out_shape=(
            jax.ShapeDtypeStruct((1, B_p), jnp.float32),
            jax.ShapeDtypeStruct((1, B_p), jnp.float32),
            jax.ShapeDtypeStruct((n_p, B_p), jnp.float32),
            jax.ShapeDtypeStruct((n_p, n_p, B_p), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_p, n_p, _LANES), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_p, _LANES), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, n_p, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * n_p * n_p * B_p,
            bytes_accessed=4 * B_p * (2 * n_p * n_p + 3 * n_p + 2),
            transcendentals=2 * n_p * B_p,
        ),
    )(K3, r2)

    quad = quad[0, :B]
    ld = ld[0, :B]
    alpha = jnp.transpose(alpha, (1, 0))[:B, :n]
    # Kinv = Linv^T Linv — a batched matmul, done on the MXU outside the
    # kernel (cheaper and simpler than a 3-D in-kernel accumulation).
    Linv_b = jnp.transpose(linv, (2, 0, 1))[:B, :n, :n]
    kinv = jnp.einsum(
        "bki,bkj->bij", Linv_b, Linv_b,
        precision=jax.lax.Precision.HIGHEST,
    )
    return quad, ld, alpha, kinv


# --------------------------------------------------------------------- #
# jnp fallback for n <= _MAX_N (off-TPU backends and small lane batches).
# Large n never reaches this: `mvn_quad_logdet` routes n > _MAX_N to
# `_qd_large`, which does not pay the Linv/Kinv VJP residuals in forward.
# --------------------------------------------------------------------- #
def _qd_jnp(K: Array, r: Array):
    """K: (B, n, n), r: (B, n) — batched via standard lax.linalg."""
    L = jnp.linalg.cholesky(K)
    w = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)
    alpha = jax.scipy.linalg.solve_triangular(
        L, w, lower=True, trans=1
    )[..., 0]
    w = w[..., 0]
    quad = jnp.sum(w * w, axis=-1)
    ld = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    # HIGHEST precision is load-bearing on TPU: Kinv is the VJP of logdet
    # (the MLL gradient driving NUTS and every MAP fit); the default
    # bf16-accumulate einsum loses ~3 digits (measured 1.6e-4 abs err vs
    # 1.9e-8 for the Pallas path at n=24, B=32).
    Kinv = jnp.einsum(
        "...ki,...kj->...ij", Linv, Linv,
        precision=jax.lax.Precision.HIGHEST,
    )
    return quad, ld, alpha, Kinv


def _pallas_ok(n: int, batch: int) -> bool:
    # The in-kernel recurrences are ~n^2/2 dependent vector ops whose cost
    # is batch-independent (batch rides the lane axis): the kernel wins
    # when enough lanes amortize it (NUTS chains, MC ensembles), while at
    # batch 1-4 (single fits, few restarts) XLA's loop pipelines better.
    # Measured on v5e: n=24/B=32 kernel 2.7x faster end-to-end (NUTS);
    # n=40/B=2 kernel 1.2x slower (MAP fit) — crossover is ~B=8.
    return (
        jax.default_backend() == "tpu" and n <= _MAX_N and batch >= 8
    )


# --------------------------------------------------------------------- #
# Batched core with a lane-collapsing vmap rule
# --------------------------------------------------------------------- #
@jax.custom_batching.custom_vmap
def _qd_core(K: Array, r: Array):
    """K: (B, n, n), r: (B, n). Returns (quad, logdet, alpha, Kinv)."""
    n = K.shape[-1]
    if _pallas_ok(n, K.shape[0]):
        return _qd_pallas(K, r, n)
    return _qd_jnp(K, r)


@_qd_core.def_vmap
def _qd_core_vmap(axis_size, in_batched, K, r):
    # collapse the mapped axis into the existing lane batch instead of
    # letting vmap lift the pallas_call into a sequential grid.
    k_b, r_b = in_batched
    if not k_b:
        K = jnp.broadcast_to(K[None], (axis_size, *K.shape))
    if not r_b:
        r = jnp.broadcast_to(r[None], (axis_size, *r.shape))
    V, B, n = K.shape[0], K.shape[1], K.shape[-1]
    quad, ld, alpha, kinv = _qd_core(
        K.reshape(V * B, n, n), r.reshape(V * B, n)
    )
    return (
        quad.reshape(V, B),
        ld.reshape(V, B),
        alpha.reshape(V, B, n),
        kinv.reshape(V, B, n, n),
    ), (True, True, True, True)


# --------------------------------------------------------------------- #
# Public differentiable op
# --------------------------------------------------------------------- #
@jax.custom_vjp
def _mvn_quad_logdet_b(K: Array, r: Array):
    quad, ld, _, _ = _qd_core(K, r)
    return quad, ld


def _mvn_fwd(K, r):
    quad, ld, alpha, kinv = _qd_core(K, r)
    return (quad, ld), (alpha, kinv)


def _mvn_bwd(res, g):
    alpha, kinv = res
    g_quad, g_ld = g
    outer = alpha[..., :, None] * alpha[..., None, :]
    dK = g_ld[..., None, None] * kinv - g_quad[..., None, None] * outer
    dr = 2.0 * g_quad[..., None] * alpha
    return dK, dr


_mvn_quad_logdet_b.defvjp(_mvn_fwd, _mvn_bwd)


_TRSM_BLOCK = 1024


def _blocked_tril_inverse(L: Array, nb: int = _TRSM_BLOCK) -> Array:
    """`L^-1` for lower-triangular `L (..., n, n)` via blocked forward
    substitution: per-panel small triangular solves + MXU matmul updates.

    XLA's TPU `triangular_solve` with an (n, n) right-hand side
    materializes every intermediate row-panel of the substitution as a
    separate HLO temp — 15.7 GB at n = 10240 (measured; it cannot even
    compile, and is why round 3's `_qd_jnp` routing OOMed at large n).
    The blocked form keeps one running buffer and puts ~all FLOPs in the
    trailing `dot`s: 49 ms at n = 10240 on v5e (vs OOM), residual 2e-7.
    """
    n = L.shape[-1]
    hp = jax.lax.Precision.HIGHEST
    eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
    X = jnp.zeros_like(L)
    for k0 in range(0, n, nb):
        Bk = eye[..., k0:k0 + nb, :]
        if k0:
            Bk = Bk - jnp.matmul(
                L[..., k0:k0 + nb, :k0], X[..., :k0, :], precision=hp
            )
        Xk = jax.lax.linalg.triangular_solve(
            L[..., k0:k0 + nb, k0:k0 + nb], Bk,
            left_side=True, lower=True,
        )
        X = jax.lax.dynamic_update_slice_in_dim(X, Xk, k0, axis=-2)
    return X


@jax.custom_vjp
def _qd_large(K: Array, r: Array) -> tuple[Array, Array]:
    """Large-n path (n > _MAX_N): single-factorization forward with a
    closed-form backward.

    The forward does exactly ONE O(n^3) op — the factorization; the
    right-hand side is a vector, so both triangular solves are O(n^2).
    The backward uses the analytic MLL-term gradients
    `d quad/dK = -alpha alpha^T`, `d logdet/dK = K^-1`, computing `K^-1`
    from the saved factor via the blocked triangular inverse + one
    HIGHEST-precision syrk. Measured at n = 10240 on v5e: value+grad
    130 ms vs 283 ms through JAX's native Cholesky VJP (whose internal
    full-matrix TRSMs are the cost), with the forward unchanged (36 ms)
    — no-grad evaluations and rejected L-BFGS steps still pay only the
    single factorization.
    """
    quad, ld, _ = _qd_large_fwd_core(K, r)
    return quad, ld


def _qd_large_fwd_core(K: Array, r: Array):
    L = jnp.linalg.cholesky(K)
    w = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)
    quad = jnp.sum(w[..., 0] * w[..., 0], axis=-1)
    ld = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
    alpha = jax.scipy.linalg.solve_triangular(
        L, w, lower=True, trans=1
    )[..., 0]
    return quad, ld, (L, alpha)


def _qd_large_fwd(K, r):
    quad, ld, (L, alpha) = _qd_large_fwd_core(K, r)
    return (quad, ld), (L, alpha)


def _qd_large_bwd(res, g):
    L, alpha = res
    g_quad, g_ld = g
    hp = jax.lax.Precision.HIGHEST
    Linv = _blocked_tril_inverse(L)
    kinv = jnp.matmul(jnp.swapaxes(Linv, -1, -2), Linv, precision=hp)
    outer = alpha[..., :, None] * alpha[..., None, :]
    dK = g_ld[..., None, None] * kinv - g_quad[..., None, None] * outer
    dr = 2.0 * g_quad[..., None] * alpha
    return dK, dr


_qd_large.defvjp(_qd_large_fwd, _qd_large_bwd)


def mvn_quad_logdet(K: Array, r: Array) -> tuple[Array, Array]:
    r"""`(r^T K^-1 r, log|K|)` for PSD `K: (..., n, n)`, `r: (..., n)`.

    One fused Pallas kernel on TPU (n <= 64); arbitrary leading batch
    dims; differentiable in both arguments (closed-form VJP — no
    factorization in the backward pass). For n > 64 `_qd_large` runs a
    single-factorization forward (`lax.linalg.cholesky` + triangular
    solves) with a closed-form `custom_vjp` backward built on the
    blocked explicit inverse (`_blocked_tril_inverse`) — reverse-mode
    only, like the small-n kernel. `K` must already
    include noise/jitter on its diagonal. This is THE primitive under
    every exact-GP marginal likelihood (`SingleTaskGP.mll`) and the SAAS
    NUTS potential (`models/fully_bayesian.py`), replacing the
    reference's ATen `cholesky` + `triangular_solve` pipeline
    (SURVEY §3.1-3.2).
    """
    batch = K.shape[:-2]
    n = K.shape[-1]
    if n > _MAX_N:
        rb = jnp.broadcast_to(r, (*batch, n))
        return _qd_large(K, rb)
    Kb = K.reshape((-1, n, n))
    rb = jnp.broadcast_to(r, (*batch, n)).reshape((-1, n))
    quad, ld = _mvn_quad_logdet_b(Kb, rb)
    return quad.reshape(batch), ld.reshape(batch)
