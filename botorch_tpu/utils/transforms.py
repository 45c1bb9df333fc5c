r"""Input/outcome normalization helpers and batch-shape conventions.

JAX analogue of `botorch/utils/transforms.py:26-121` (normalize /
unnormalize / standardize). The reference's `t_batch_mode_transform`
decorator (same file, :228) has no direct analogue here: acquisition
functions in this framework are written for a single `(q, d)` candidate set
and batched explicitly with `jax.vmap`, which is the idiomatic JAX way to
get the `b x q x d -> b` contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize(X: Array, bounds: Array) -> Array:
    """Min-max scale `X` (shape `... x d`) to `[0, 1]^d` given `bounds` (2 x d)."""
    lo, hi = bounds[0], bounds[1]
    return (X - lo) / (hi - lo)


def unnormalize(X: Array, bounds: Array) -> Array:
    """Inverse of :func:`normalize`."""
    lo, hi = bounds[0], bounds[1]
    return X * (hi - lo) + lo


def normalize_indices(indices, d: int):
    """Normalize (possibly negative) indices into `range(d)`."""
    if indices is None:
        return None
    return [i % d for i in indices]


def standardize(Y: Array) -> Array:
    """Standardize `Y` (shape `... x n x m`) to zero mean / unit variance per
    output along the `n` axis, guarding degenerate (n<=1 or constant) cases."""
    stddim = -1 if Y.ndim <= 1 else -2
    n = Y.shape[stddim]
    if n <= 1:
        return jnp.zeros_like(Y)
    mean = jnp.mean(Y, axis=stddim, keepdims=True)
    std = jnp.std(Y, axis=stddim, ddof=1, keepdims=True)
    std = jnp.where(std < 1e-12, 1.0, std)
    return (Y - mean) / std


def match_batch_shape(X, Y):
    """Expand `X`'s batch dims (all but the last two) to match `Y`'s
    (reference `utils/transforms.py:339`): right-aligned broadcast, used
    when concatenating pending/baseline points onto batched candidates."""
    import jax.numpy as _jnp

    target = Y.shape[:-2] + X.shape[-2:]
    return _jnp.broadcast_to(X, target)


def is_ensemble(model) -> bool:
    """True if the model carries an extra leading (ensemble) batch axis —
    fantasy or MCMC (reference `utils/transforms.py:212`)."""
    bs = getattr(model, "batch_shape", ())
    return len(tuple(bs)) > 0


def is_fully_bayesian(model) -> bool:
    """True for NUTS-fitted ensemble models (reference
    `utils/transforms.py:196`): the model exposes an MCMC ensemble axis
    (`num_mcmc_samples` attribute set by the SAAS loaders) or a nonempty
    batch shape tagged as fully Bayesian."""
    if getattr(model, "num_mcmc_samples", None):
        return True
    return bool(getattr(model, "_is_fully_bayesian", False))


def standardize_moments(mean, variance):
    """Standardize a Gaussian's moments by the mean/std of `mean`
    (reference `utils/test_helpers.py` `standardize_moments`)."""
    import jax.numpy as _jnp

    mu = _jnp.mean(mean, axis=-2, keepdims=True)
    sd = _jnp.std(mean, axis=-2, keepdims=True)
    return (mean - mu) / sd, variance / _jnp.square(sd)


def detect_duplicates(X, rtol: float = 0.0, atol: float = 1e-8):
    """Iterator of `(duplicate index, original index)` pairs over the rows
    of a 2-d `X` (reference `models/utils/assorted.py:300`). Host-side
    (numpy) data preparation, used before building comparison models."""
    import numpy as np

    Xn = np.asarray(X)
    if Xn.ndim != 2:
        raise ValueError("X must have 2 dimensions.")
    n = Xn.shape[0]
    dist = np.max(np.abs(Xn[:, None, :] - Xn[None, :, :]), axis=-1)
    tols = atol
    if rtol:
        rval = np.max(np.abs(Xn), axis=-1, keepdims=True)
        tols = tols + rtol * np.maximum(rval, rval.T)
    dist = np.where(np.tri(n, k=0, dtype=bool), np.inf, dist)  # upper only
    # argmin over the TOLERANCE-ADJUSTED distance (the reference minimizes
    # `(dist - tols)`, `assorted.py:329` — with rtol > 0 the nearest raw
    # neighbor may fail its tolerance while a farther one passes)
    adj = dist - (tols if np.isscalar(tols) else tols)
    for i in range(n):
        col = adj[:, i]
        j = int(np.argmin(col))
        if col[j] < 0:
            yield (i, j)


def consolidate_duplicates(X, Y, rtol: float = 0.0, atol: float = 1e-8):
    """Drop duplicated rows of `X` and remap the index tensor `Y`
    (e.g. pairwise comparisons) accordingly (reference
    `models/utils/assorted.py:334`). Returns `(X, Y, new_indices)` as
    jnp arrays; `new_indices[i]` is row `i`'s index after consolidation."""
    import numpy as np

    Xn = np.asarray(X)
    Yn = np.asarray(Y)
    n = Xn.shape[0]
    dup_map = dict(detect_duplicates(Xn, rtol=rtol, atol=atol))
    # Conservative chain handling, exactly as the reference
    # (`assorted.py:357-363`): entries whose key or target participates in
    # a duplicate CHAIN (a row that is both kept and dropped) are left
    # unconsolidated rather than resolved to a root.
    common = set(dup_map.keys()).intersection(dup_map.values())
    for k in list(dup_map):
        if k in common or dup_map[k] in common:
            del dup_map[k]
    if not dup_map:
        return (
            jnp.asarray(Xn),
            jnp.asarray(Yn),
            jnp.arange(n, dtype=jnp.int32),
        )
    dup_indices = set(dup_map.keys())
    unique_indices = sorted(set(range(n)) - dup_indices)
    new_idx = {old: new for new, old in enumerate(unique_indices)}
    for old, kept in dup_map.items():
        new_idx[old] = new_idx[kept]
    remap = np.array([new_idx[i] for i in range(n)], dtype=np.int32)
    return (
        jnp.asarray(Xn[unique_indices]),
        jnp.asarray(remap[Yn]),
        jnp.asarray(remap),
    )
