r"""Pareto-frontier entropy search (PFES), any m.

The proper multi-objective entropy search (reference family:
`botorch/acquisition/multi_objective/joint_entropy_search.py:39,256` and
[Suzuki2020pfes]): information about the Pareto FRONTIER itself, not just
per-objective maxima (MESMO's approximation).

Construction:
  1. sample Pareto frontiers `F*_k` from joint pathwise (Matheron) draws
     of both outputs over a Sobol grid;
  2. conditioned on `F*`, any function value must lie in the DOMINATED
     region `D(F*) = {y : exists f* >= y}` — a disjoint union of boxes:
     the 2-d staircase, or the general-m [Lacour17] dominated
     partitioning (`utils/multi_objective.dominated_hypercell_bounds_np`)
     with a `-inf` (sentinel) reference;
  3. the entropy of an independent-output Gaussian truncated to that
     union has the exact closed form
        `H = log Z + (1/Z) sum_c w_c sum_j [ 1/2 log(2 pi sigma_j^2)
           + 1/2 (1 + (a phi(a) - b phi(b)) / Z_cj) ]`
     with `w_c = prod_j Z_cj`, `Z = sum_c w_c` (disjoint cells make the
     mixture decomposition exact);
  4. `PFES(x) = H[y | D] - mean_k H[y | D, y in D(F*_k)]`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.utils.multi_objective import (
    dominated_hypercell_bounds_np,
    is_non_dominated,
)
from botorch_tpu.utils.probability import ndtr, phi

Array = jax.Array

_half_log_2pi_e = 0.5 * math.log(2.0 * math.pi * math.e)
_half_log_2pi = 0.5 * math.log(2.0 * math.pi)
_NEG = -1e8


def _staircase_cells_2d(front: Array, pad_to: int):
    """Dominated-region cells of a 2-d maximization front, with `-inf`
    (clipped) lower corners: partition in y1 by the sorted front, ceiling
    in y2 by the staircase. Returns `(upper1, upper2, left1)` arrays of
    length `pad_to` (padding cells have zero probability mass)."""
    # sort ascending in f1; f2 then descends along the true front
    order = jnp.argsort(front[:, 0])
    f1 = front[order, 0]
    f2 = front[order, 1]
    k = front.shape[0]
    # cells: c = 0..k-1: y1 in (f1_{c-1}, f1_c], y2 <= f2_c
    left1 = jnp.concatenate([jnp.asarray([_NEG]), f1[:-1]])
    upper1 = f1
    upper2 = f2
    pad = pad_to - k
    if pad > 0:
        left1 = jnp.concatenate([left1, jnp.full((pad,), _NEG)])
        upper1 = jnp.concatenate([upper1, jnp.full((pad,), _NEG)])
        upper2 = jnp.concatenate([upper2, jnp.full((pad,), _NEG)])
    return left1, upper1, upper2


def _truncated_union_entropy(mu, sigma, left1, upper1, upper2):
    """Closed-form entropy of `N(mu, diag(sigma^2))` truncated to the
    staircase union (see module docstring). All inputs standardized
    internally; returns `(H, log Z)`."""
    # clip standardized bounds: probabilities/φ saturate beyond ~±12, and
    # unclipped ±1e8 sentinels produce inf*0 NaNs in the backward pass
    a1 = jnp.clip((left1 - mu[0]) / sigma[0], -12.0, 12.0)
    b1 = jnp.clip((upper1 - mu[0]) / sigma[0], -12.0, 12.0)
    b2 = jnp.clip((upper2 - mu[1]) / sigma[1], -12.0, 12.0)
    Z1 = jnp.clip(ndtr(b1) - ndtr(a1), 0.0)
    Z2 = jnp.clip(ndtr(b2), 0.0)
    w = Z1 * Z2
    Z = jnp.clip(jnp.sum(w), 1e-30)
    # per-cell, per-dim truncated "negative log-density expectation":
    #   1/2 log(2 pi sigma^2) + 1/2 (1 + (a phi(a) - b phi(b)) / Z_j)
    # Safe-where guards: 1/Z^2 overflows float32 in the backward pass for
    # tiny cell masses, so zero-mass cells are excluded in BOTH branches.
    tiny = 1e-10
    Z1_safe = jnp.where(Z1 > tiny, Z1, 1.0)
    Z2_safe = jnp.where(Z2 > tiny, Z2, 1.0)
    t1 = jnp.where(
        Z1 > tiny, (a1 * phi(a1) - b1 * phi(b1)) / Z1_safe, 0.0
    )
    t2 = jnp.where(Z2 > tiny, (-b2 * phi(b2)) / Z2_safe, 0.0)  # lower bound at -inf
    per_cell = (
        (_half_log_2pi + jnp.log(sigma[0]) + 0.5 * (1.0 + t1))
        + (_half_log_2pi + jnp.log(sigma[1]) + 0.5 * (1.0 + t2))
    )
    H = jnp.log(Z) + jnp.sum(
        jnp.where(w > tiny, w * per_cell, 0.0)
    ) / Z
    return H, jnp.log(Z)


def _truncated_union_entropy_cells(mu, sigma, lower, upper):
    """General-m closed-form entropy of `N(mu, diag(sigma^2))` truncated
    to a disjoint box union `(C, m)` (same construction as the 2-d
    staircase case; sentinel `-1e8` bounds act as `-inf`). Returns
    `(H, log Z)`."""
    a = jnp.clip((lower - mu) / sigma, -12.0, 12.0)
    b = jnp.clip((upper - mu) / sigma, -12.0, 12.0)
    Zc = jnp.clip(ndtr(b) - ndtr(a), 0.0)  # (C, m)
    w = jnp.prod(Zc, axis=-1)  # (C,)
    Z = jnp.clip(jnp.sum(w), 1e-30)
    tiny = 1e-10
    Zc_safe = jnp.where(Zc > tiny, Zc, 1.0)
    t = jnp.where(
        Zc > tiny, (a * phi(a) - b * phi(b)) / Zc_safe, 0.0
    )
    per_cell = jnp.sum(
        _half_log_2pi + jnp.log(sigma) + 0.5 * (1.0 + t), axis=-1
    )
    H = jnp.log(Z) + jnp.sum(jnp.where(w > tiny, w * per_cell, 0.0)) / Z
    return H, jnp.log(Z)


class qParetoFrontierEntropySearch(struct.PyTreeNode):
    """PFES for q = 1, m = 2. Built by `make_pfes`."""

    model: SingleTaskGP
    cache: tuple
    cell_lower: Array  # (K, C, m)
    cell_upper: Array  # (K, C, m)

    def __call__(self, X: Array) -> Array:
        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0, :]  # (m,)
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, :], 1e-12))
        h0 = jnp.sum(_half_log_2pi_e + jnp.log(sigma))

        def per_front(lo, up):
            H, _ = _truncated_union_entropy_cells(mu, sigma, lo, up)
            return H

        hks = jax.vmap(per_front)(self.cell_lower, self.cell_upper)
        return h0 - jnp.mean(hks)


def make_pfes(
    model: SingleTaskGP,
    bounds: Array,
    key: Array,
    num_fronts: int = 8,
    grid_size: int = 512,
    num_features: int = 512,
) -> qParetoFrontierEntropySearch:
    """Sample Pareto frontiers from joint pathwise draws over a Sobol grid
    and precompute their dominated-region cells."""
    import numpy as np

    from botorch_tpu.models.model_list import batched_to_model_list
    from botorch_tpu.sampling.pathwise import draw_matheron_paths
    from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

    m_out = model.num_outputs
    d = bounds.shape[-1]
    sv, shift = sobol_table(d, scramble=True, seed=int(key[-1]) & 0x7FFFFFFF)
    grid = bounds[0] + (bounds[1] - bounds[0]) * draw_sobol(sv, shift, grid_size)

    ml = batched_to_model_list(model)
    keys = jax.random.split(key, m_out)
    Ys = [
        np.asarray(
            draw_matheron_paths(ml.models[o], keys[o], num_fronts,
                                num_features)(grid)
        )
        for o in range(m_out)
    ]  # each (K, grid)

    cell_los, cell_ups = [], []
    for s in range(num_fronts):
        Y = np.stack([Ys[o][s] for o in range(m_out)], axis=-1)
        front = Y[np.asarray(is_non_dominated(jnp.asarray(Y)))]
        if m_out == 2:
            order = np.argsort(front[:, 0])
            f1, f2 = front[order, 0], front[order, 1]
            lo = np.stack(
                [np.concatenate([[_NEG], f1[:-1]]), np.full(len(f1), _NEG)],
                -1,
            )
            up = np.stack([f1, f2], -1)
        else:
            lo, up = dominated_hypercell_bounds_np(
                front, np.full(m_out, _NEG)
            )
        cell_los.append(np.asarray(lo, np.float32))
        cell_ups.append(np.asarray(up, np.float32))
    C = max(len(lo) for lo in cell_los)
    L = np.full((num_fronts, C, m_out), _NEG, np.float32)
    U = np.full((num_fronts, C, m_out), _NEG, np.float32)
    for s in range(num_fronts):
        L[s, : len(cell_los[s])] = cell_los[s]
        U[s, : len(cell_ups[s])] = cell_ups[s]
    return qParetoFrontierEntropySearch(
        model=model,
        cache=model.train_chol(),
        cell_lower=jnp.asarray(L),
        cell_upper=jnp.asarray(U),
    )
