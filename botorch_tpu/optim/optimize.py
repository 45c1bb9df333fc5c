r"""Acquisition-function optimization: multi-start L-BFGS on device.

Counterpart of `botorch/optim/optimize.py:397` (`optimize_acqf`) +
`botorch/optim/initializers.py:243,893` (Sobol raw sampling, Boltzmann
initial-condition selection) + `botorch/generation/gen.py:46`
(`gen_candidates_scipy`).

The reference's pipeline crosses the CPU boundary per L-BFGS iteration
(numpy <-> torch marshalling into Fortran). Here the entire pipeline —
raw-sample evaluation, IC selection, all restarts of the bound-constrained
L-BFGS ascent, and the final argmax — is one compiled JAX program: restarts
are vmapped lanes of `multi_start_lbfgsb` and can be sharded over a device
mesh along the restart axis (SURVEY §2.10: the t-batch axis is the sharding
opportunity).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from botorch_tpu.ops.lbfgs import multi_start_lbfgsb
from botorch_tpu.sampling.sobol import draw_sobol, draw_sobol_samples, sobol_table

Array = jax.Array


def initialize_q_batch(
    key: Array, X: Array, acq_vals: Array, n: int, eta: float = 1.0
) -> Array:
    """Boltzmann-weighted selection of `n` ICs from raw candidates
    (reference `initializers.py:893-965`).

    Heuristic: sample `n` of the `b` raw q-batches without replacement with
    probability `~ exp(eta * standardize(acq_val))` (Gumbel-top-k), always
    including the argmax.
    """
    b = X.shape[0]
    vals = jnp.where(jnp.isfinite(acq_vals), acq_vals, -jnp.inf)
    max_idx = jnp.argmax(vals)
    std = jnp.std(vals, where=jnp.isfinite(vals))
    std = jnp.where((std > 0) & jnp.isfinite(std), std, 1.0)
    mean = jnp.mean(vals, where=jnp.isfinite(vals))
    mean = jnp.where(jnp.isfinite(mean), mean, 0.0)
    z = (vals - mean) / std
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (b,), minval=1e-20)))
    scores = jnp.where(jnp.isfinite(vals), eta * z + gumbel, -jnp.inf)
    _, idcs = jax.lax.top_k(scores, n)
    # Guarantee the argmax is present (replace the last pick if missing).
    has_max = jnp.any(idcs == max_idx)
    idcs = jnp.where(
        has_max, idcs, idcs.at[-1].set(max_idx)
    )
    return X[idcs]


def gen_batch_initial_conditions(
    acqf: Callable[[Array], Array],
    bounds: Array,
    q: int,
    num_restarts: int,
    raw_samples: int,
    key: Array,
    seed: int = 0,
    eta: float = 1.0,
    batch_eval_limit: Optional[int] = None,
    sobol: Optional[tuple[Array, Array]] = None,
    sobol_skip: Array | int = 0,
) -> Array:
    """Sobol raw q-batches -> no-grad acqf eval -> Boltzmann selection
    (reference `initializers.py:243-438`). Returns `(num_restarts, q, d)`.

    `sobol`/`sobol_skip` allow a caller (e.g. a fully-compiled BO loop) to
    supply a persistent scrambled-Sobol stream and a traced skip offset, so
    successive iterations continue one low-discrepancy sequence without
    host-side table rebuilds.
    """
    d = bounds.shape[-1]
    if sobol is None:
        X_raw = draw_sobol_samples(bounds, raw_samples, q, seed=seed)
    else:
        sv, shift = sobol
        u = draw_sobol(sv, shift, raw_samples, skip=sobol_skip)
        u = u.reshape(raw_samples, q, d)
        X_raw = bounds[0] + (bounds[1] - bounds[0]) * u
    vals = jax.lax.map(
        acqf, X_raw, batch_size=batch_eval_limit or raw_samples
    )
    return initialize_q_batch(key, X_raw, vals, num_restarts, eta=eta)


def optimize_acqf(
    acqf: Callable[[Array], Array],
    bounds: Array,
    q: int,
    num_restarts: int = 8,
    raw_samples: int = 128,
    key: Optional[Array] = None,
    maxiter: int = 100,
    seed: int = 0,
    initial_conditions: Optional[Array] = None,
    return_full: bool = False,
    sobol: Optional[tuple[Array, Array]] = None,
    sobol_skip: Array | int = 0,
    shard_fn=None,
):
    """Maximize `acqf` over `q` joint candidates in the box `bounds (2, d)`.

    Args:
        acqf: pure function `(q, d) -> scalar` (vmapped internally).
        key: PRNG key for IC selection randomness.

    Returns:
        `(candidates (q, d), value)` — or, with `return_full`, the per-
        restart `(candidates, values)` before the argmax (used by portfolio
        methods).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    d = bounds.shape[-1]

    if initial_conditions is None:
        ics = gen_batch_initial_conditions(
            acqf, bounds, q, num_restarts, raw_samples, key, seed=seed,
            sobol=sobol, sobol_skip=sobol_skip,
        )
    else:
        ics = initial_conditions
        num_restarts = ics.shape[0]

    neg_fun = lambda v: -acqf(v.reshape(q, d))
    lo = jnp.tile(bounds[0], q)
    hi = jnp.tile(bounds[1], q)
    res = multi_start_lbfgsb(
        neg_fun,
        ics.reshape(num_restarts, q * d),
        bounds=(lo, hi),
        maxiter=maxiter,
        shard_fn=shard_fn,
    )
    vals = jnp.where(jnp.isfinite(res.fun), -res.fun, -jnp.inf)
    cands = res.x.reshape(num_restarts, q, d)
    if return_full:
        return cands, vals
    best = jnp.argmax(vals)
    return cands[best], vals[best]


def optimize_acqf_discrete(
    acqf: Callable[[Array], Array],
    choices: Array,
    q: int = 1,
    max_batch_size: int = 2048,
):
    """Exhaustive evaluation over a discrete candidate set
    (reference `optim/optimize.py:990`): evaluates each choice as a q=1
    batch and returns the top-q choices greedily."""
    X = choices[:, None, :]  # (c, 1, d)
    vals = jax.lax.map(acqf, X, batch_size=min(max_batch_size, X.shape[0]))
    _, idx = jax.lax.top_k(vals, q)
    return choices[idx], vals[idx]
