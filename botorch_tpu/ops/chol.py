r"""PSD-safe Cholesky factorization and triangular solves.

Replaces the reference's ATen/LAPACK surface (`linear_operator`'s
`psd_safe_cholesky`, `cholesky_solve`, `trsm` — see SURVEY §2.9): batched
`lax.linalg` factorizations wrapped with a float32-appropriate jitter
policy. Exact-GP solves in this framework are float32-first (TPU has no
fast float64), so unlike the reference we *always* add a small relative
jitter — cheap insurance that is dominated by the likelihood's noise floor
(`MIN_INFERRED_NOISE_LEVEL = 1e-4`) — and provide an escalating-jitter
rescue for genuinely ill-conditioned matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Relative jitter always added before factorization (float32 regime).
DEFAULT_JITTER = 1e-6
# Escalation ladder for `psd_safe_cholesky` (relative to mean |diagonal|).
# The top rungs look extreme, but they only engage for near-zero covariances
# (e.g. a noiseless posterior evaluated AT the training points) where the
# f32 cancellation error exceeds the diagonal scale itself; there, inflating
# the factor is the correct rescue (the matrix is numerically zero).
_JITTER_LADDER = (0.0, 1e-6, 1e-4, 1e-2, 1e-1, 1.0, 1e2)
# Absolute floor on the jitter scale so degenerate (≈0 or indefinite-from-
# roundoff) diagonals still receive a usable jitter.
_SCALE_FLOOR = 1e-10


def add_jitter(A: Array, jitter: float = DEFAULT_JITTER) -> Array:
    """Add `jitter * max(mean(|diag(A)|), floor)` to the diagonal."""
    n = A.shape[-1]
    diag_mean = jnp.mean(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1)
    scale = jnp.maximum(diag_mean, jnp.asarray(_SCALE_FLOOR, dtype=A.dtype))
    eye = jnp.eye(n, dtype=A.dtype)
    return A + (jitter * scale)[..., None, None] * eye


def cholesky(A: Array, jitter: float = DEFAULT_JITTER) -> Array:
    """Lower Cholesky factor of `A + jitter * mean(diag) * I` (differentiable)."""
    return jnp.linalg.cholesky(add_jitter(A, jitter))


# Above this matrix size, probing every ladder rung eagerly costs more
# than the factorization it protects — large train covariances carry the
# likelihood noise floor (>= 1e-4) on their diagonal, so the base rung
# almost always succeeds and the probe is demand-driven instead.
_LADDER_PROBE_MAX_N = 256


def psd_safe_cholesky(A: Array, base_jitter: float = DEFAULT_JITTER) -> Array:
    """Cholesky with escalating-jitter rescue (reference: linear_operator's
    `psd_safe_cholesky` retry loop).

    The needed jitter level is found under `stop_gradient`, then a single
    differentiable factorization is done at the selected level —
    gradients flow through exactly one Cholesky. For n <= 256 every rung
    of the fixed ladder is probed vectorized (static shapes, no
    data-dependent control flow). For larger matrices the probe is a
    `while_loop` that escalates only while the factorization is
    non-finite: the common case costs ONE probe factorization instead of
    eight O(n^3) ones (round-3 verdict: the eager ladder dominated
    `train_chol` at n ~ 10^4).
    """
    ladder = jnp.asarray(_JITTER_LADDER, dtype=A.dtype) + base_jitter
    top = len(_JITTER_LADDER) - 1

    if A.shape[-1] <= _LADDER_PROBE_MAX_N:
        def try_level(j):
            L = cholesky(A, jitter=j)
            ok = jnp.all(jnp.isfinite(L))
            return ok

        oks = jax.lax.stop_gradient(jax.vmap(try_level)(ladder))
        # Select the first successful rung (fall back to the largest).
        first_ok = jnp.argmax(oks)  # argmax returns first True
        any_ok = jnp.any(oks)
        idx = jnp.where(any_ok, first_ok, top)
    else:
        A_sg = jax.lax.stop_gradient(A)

        def needs_escalation(i):
            L = jnp.linalg.cholesky(add_jitter(A_sg, ladder[i]))
            return jnp.logical_and(
                ~jnp.all(jnp.isfinite(L)), i < top
            )

        idx = jax.lax.while_loop(
            needs_escalation, lambda i: i + 1, jnp.asarray(0, jnp.int32)
        )
    jitter = jax.lax.stop_gradient(ladder[idx])
    return cholesky(A, jitter=jitter)


def solve_triangular(L: Array, b: Array, lower: bool = True, trans: bool = False) -> Array:
    """Batched triangular solve `L x = b` (or `L^T x = b` if `trans`)."""
    return jax.scipy.linalg.solve_triangular(
        L, b, lower=lower, trans=1 if trans else 0
    )


def cholesky_solve(L: Array, b: Array) -> Array:
    """Solve `A x = b` given the lower Cholesky factor `L` of `A`."""
    y = solve_triangular(L, b, lower=True)
    return solve_triangular(L, y, lower=True, trans=True)


def chol_logdet(L: Array) -> Array:
    """`log det(A)` from the lower Cholesky factor of `A`."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def update_chol(L: Array, B: Array, C: Array) -> Array:
    r"""Low-rank block extension of a Cholesky factor.

    Given `L = chol(A)` for `A: (n, n)` and the bordered matrix
    `[[A, B], [B^T, C]]` with `B: (n, q)`, `C: (q, q)`, returns the Cholesky
    factor of the bordered matrix in `O(n^2 q)` instead of `O((n+q)^3)` —
    the cached-root update of `botorch/acquisition/cached_cholesky.py:94-130`
    / `botorch/utils/low_rank.py`.
    """
    n, q = B.shape[-2], B.shape[-1]
    L12 = solve_triangular(L, B, lower=True)  # (n, q)
    # Schur complement (q, q) — f32 HIGHEST: the TPU default bf16 matmul
    # injects 2^-9-level error into S and hence L22 (seen on chip, r5)
    S = C - jnp.matmul(
        jnp.swapaxes(L12, -1, -2), L12, precision=jax.lax.Precision.HIGHEST
    )
    L22 = psd_safe_cholesky(S)
    top = jnp.concatenate(
        [L, jnp.zeros((*L.shape[:-2], n, q), dtype=L.dtype)], axis=-1
    )
    bot = jnp.concatenate([jnp.swapaxes(L12, -1, -2), L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def augment_cholesky(Lf: Array, Knn: Array, Kfn: Array) -> Array:
    """Reference-named wrapper of `update_chol` (reference
    `utils/probability/linalg.py:34` `augment_cholesky(Laa, Kbb, Kba)`):
    extend `Lf = chol(K_ff)` to the factor of
    `[[K_ff, K_fn^T], [K_fn, K_nn]]`."""
    return update_chol(Lf, jnp.swapaxes(Kfn, -1, -2), Knn)
