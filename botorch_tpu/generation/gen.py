r"""Gradient-based candidate refinement without L-BFGS.

Counterpart of `botorch/generation/gen.py:301` (`gen_candidates_torch`):
an Adam ascent on the acquisition surface, the right inner optimizer when
the acqf is STOCHASTIC (fresh base samples each evaluation — the
`StochasticSampler` path) and the deterministic-surface assumption behind
L-BFGS line searches breaks. All restarts step in lockstep inside one jit
(`lax.fori_loop` + vmap), with iterates projected into the bounds each
step (the reference's `columnwise_clamp`).

The L-BFGS-B path (`gen_candidates_scipy` equivalent) lives in
`ops/lbfgs.py` / `optim/optimize.py`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def gen_candidates_adam(
    acqf: Callable[[Array], Array],
    initial_conditions: Array,
    bounds: Array,
    maxiter: int = 128,
    lr: float = 0.025,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    key: Optional[Array] = None,
) -> tuple[Array, Array]:
    """Maximize `acqf` from `(b, q, d)` initial conditions with projected
    Adam (reference `gen_candidates_torch` defaults: Adam, lr 0.025).

    If `key` is given, `acqf` is called as `acqf(X, key)` with a fresh
    subkey per iteration (stochastic-sampler support); otherwise as
    `acqf(X)`.

    Returns:
        `(candidates (b, q, d), values (b,))` — final iterates (projected)
        and their no-resampling acquisition values.
    """
    lo, hi = bounds[0], bounds[1]
    x0 = jnp.clip(initial_conditions, lo, hi)

    if key is None:
        val_and_grad = jax.vmap(jax.value_and_grad(acqf))

        def eval_vg(x, _i):
            return val_and_grad(x)

    else:
        vg = jax.vmap(jax.value_and_grad(acqf), in_axes=(0, None))

        def eval_vg(x, i):
            return vg(x, jax.random.fold_in(key, i))

    def body(i, carry):
        x, m, v = carry
        _, g = eval_vg(x, i)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** (i + 1.0))
        vhat = v / (1 - b2 ** (i + 1.0))
        x = x + lr * mhat / (jnp.sqrt(vhat) + eps)  # ascent
        return jnp.clip(x, lo, hi), m, v

    @jax.jit
    def run(x0):
        m0 = jnp.zeros_like(x0)
        x, _, _ = jax.lax.fori_loop(0, maxiter, body, (x0, m0, m0))
        if key is None:
            vals = jax.vmap(acqf)(x)
        else:
            vals = jax.vmap(acqf, in_axes=(0, None))(x, key)
        return x, vals

    return run(x0)
