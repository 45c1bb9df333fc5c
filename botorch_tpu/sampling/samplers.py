r"""MC samplers: the reference's sampler objects as thin functional
wrappers over base-sample generation.

Counterpart of `botorch/sampling/normal.py:134,169`
(`IIDNormalSampler`, `SobolQMCNormalSampler`),
`stochastic_samplers.py:20,46` (`ForkedRNGSampler`, `StochasticSampler`)
and `list_sampler.py:21` (`ListSampler`). In the TPU-native design the
SAA contract is carried by explicit base-sample arrays (drawn once,
closed over by jitted acquisition programs — see
`acquisition/monte_carlo.py`), so a "sampler" here is just a recipe for
producing base samples matched to a posterior's
`base_sample_shape`, then pushing them through
`rsample_from_base_samples`.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class IIDNormalSampler(struct.PyTreeNode):
    """i.i.d. standard-normal base samples (reference `normal.py:134`)."""

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))
    seed: int = struct.field(pytree_node=False, default=0)

    def base_samples(self, shape: tuple) -> Array:
        return jax.random.normal(
            jax.random.PRNGKey(self.seed), (*self.sample_shape, *shape)
        )

    def __call__(self, posterior) -> Array:
        return posterior.rsample_from_base_samples(
            self.base_samples(posterior.base_sample_shape)
        )


class SobolQMCNormalSampler(struct.PyTreeNode):
    """Scrambled-Sobol qMC normal base samples (reference
    `normal.py:169`): low-discrepancy over the flattened event dims,
    i.i.d. across none — the variance-reduction default for MC
    acquisition functions."""

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))
    seed: int = struct.field(pytree_node=False, default=0)

    def base_samples(self, shape: tuple) -> Array:
        from botorch_tpu.sampling.sobol import draw_sobol_normal_samples

        n = math.prod(self.sample_shape)
        d = math.prod(shape)
        z = draw_sobol_normal_samples(d=d, n=n, seed=self.seed)
        return z.reshape(*self.sample_shape, *shape)

    def __call__(self, posterior) -> Array:
        return posterior.rsample_from_base_samples(
            self.base_samples(posterior.base_sample_shape)
        )


class StochasticSampler(struct.PyTreeNode):
    """Fresh randomness per call (reference `stochastic_samplers.py:46`)
    — for stochastic-gradient acquisition optimization. Pass `key` to
    control it; otherwise an internal counter-free default key is used
    (NOT fixed across calls in eager mode)."""

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))

    def __call__(self, posterior, key: Optional[Array] = None) -> Array:
        if key is None:
            key = jax.random.PRNGKey(
                jax.random.bits(jax.random.PRNGKey(0), (), "uint32")
            )  # deterministic fallback; supply a key for real use
        return posterior.rsample(key, self.sample_shape)


class ForkedRNGSampler(struct.PyTreeNode):
    """Seed-forked fresh draws (reference `stochastic_samplers.py:20`):
    same seed -> same samples, but not an SAA pathway."""

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))
    seed: int = struct.field(pytree_node=False, default=0)

    def __call__(self, posterior) -> Array:
        return posterior.rsample(
            jax.random.PRNGKey(self.seed), self.sample_shape
        )


class IndexSampler(struct.PyTreeNode):
    """Ensemble index draws (reference `index_sampler.py:64`): for
    discrete-ensemble posteriors (fully-Bayesian MCMC batches, ensemble
    models) the base sample is an INDEX into the ensemble axis, not a
    normal deviate. Sampling gathers the indexed components' means — the
    reference's `EnsemblePosterior.rsample_from_base_samples` semantics
    (`posteriors/ensemble.py:115-140`), where each ensemble member is a
    point mass (deterministic models) or is represented by its mean.

    The posterior's ensemble axis is its leading batch dim (how this
    framework encodes `MCMC_DIM`); `weights` (optional, `(s,)` over the
    ensemble) biases the draw like the reference's categorical weights.
    """

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))
    seed: int = struct.field(pytree_node=False, default=0)
    weights: Optional[Array] = None

    def indices(self, ensemble_size: int) -> Array:
        key = jax.random.PRNGKey(self.seed)
        if self.weights is not None:
            return jax.random.categorical(
                key, jnp.log(self.weights), shape=self.sample_shape
            )
        return jax.random.randint(
            key, self.sample_shape, 0, ensemble_size
        )

    def __call__(self, posterior) -> Array:
        mean = posterior.mean  # (s, ..., q, m) — leading ensemble axis
        # Point-mass assumption: gathering means silently discards
        # within-component covariance. That matches the reference's
        # deterministic EnsemblePosterior; a Gaussian ensemble (e.g. a
        # fully-Bayesian GP posterior) should instead use a normal
        # sampler over its mixture. The value check is gated behind
        # `settings.debug` so the default path neither forces a device
        # sync nor behaves differently under jit (where tracers skip it).
        from botorch_tpu import settings as _settings

        if _settings.debug.on():
            var = getattr(posterior, "variance", None)
            if var is not None and not isinstance(var, jax.core.Tracer):
                import numpy as _np

                if float(_np.max(_np.asarray(var))) > 1e-10:
                    raise ValueError(
                        "IndexSampler is for (near-)deterministic "
                        "ensemble posteriors; this posterior has "
                        "non-zero within-component variance — use a "
                        "normal sampler over the mixture instead "
                        "(get_sampler dispatch)."
                    )
        idx = self.indices(mean.shape[0])
        return jnp.take(mean, idx, axis=0)


def _comparison_pairs(n: int, max_num_comparisons: Optional[int], seed: int):
    """Static comparison-pair index set: all C(n,2) pairs, optionally
    subsampled without replacement. Chosen once at trace time (shapes
    must be static on TPU), matching the reference's construction-time
    `np.random.choice` (`pairwise_samplers.py:58-66`)."""
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    if max_num_comparisons is not None and max_num_comparisons < len(pairs):
        perm = jax.random.permutation(
            jax.random.PRNGKey(seed ^ 0x5EED), len(pairs)
        )
        idx = sorted(int(k) for k in perm[:max_num_comparisons])
        pairs = [pairs[k] for k in idx]
    return jnp.asarray(pairs, dtype=jnp.int32)  # (comp_n, 2)


def _utility_samples(samples: Array) -> Array:
    """Validate + squeeze posterior utility samples `(..., n, m=1)` to
    `(..., n)`. The candidate axis is ALWAYS -2 (reference
    `pairwise_samplers.py:53`: `s_n = samples.shape[-2]`); multi-output
    posteriors are rejected, matching the reference's single-output
    contract (`pairwise_samplers.py:44-45`)."""
    if samples.ndim < 2 or samples.shape[-1] != 1:
        raise ValueError(
            "pairwise samplers need single-output utility samples of "
            f"shape (..., n, 1); got {samples.shape}"
        )
    if samples.shape[-2] < 2:
        raise ValueError("Need >= 2 candidates to form comparisons.")
    return samples[..., 0]


def _make_comparisons(samples: Array, pairs: Array) -> Array:
    """Turn utility samples `(..., n)` into winner-first comparison index
    pairs (reference `sampling/pairwise_samplers.py:40-78`): for each
    sampled utility vector, emit `[argwinner, argloser]` over the fixed
    pair set. All on-device: a gather + `where`, no host round-trip."""
    u_i = samples[..., pairs[:, 0]]
    u_j = samples[..., pairs[:, 1]]
    pref = u_i > u_j
    c1 = jnp.where(pref, pairs[:, 0], pairs[:, 1])
    c2 = jnp.where(pref, pairs[:, 1], pairs[:, 0])
    return jnp.stack([c1, c2], axis=-1)  # (..., comp_n, 2) int32


class PairwiseIIDNormalSampler(struct.PyTreeNode):
    """Pairwise-comparison sampler over i.i.d. normal utility draws
    (reference `pairwise_samplers.py:82 PairwiseIIDNormalSampler`): draws
    utility samples from the posterior via the SAA base-sample path, then
    converts each draw into winner-first comparison pairs for use with
    `PairwiseGP`-style preference acquisition."""

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))
    seed: int = struct.field(pytree_node=False, default=0)
    max_num_comparisons: Optional[int] = struct.field(
        pytree_node=False, default=None
    )

    def __call__(self, posterior) -> Array:
        u = _utility_samples(
            IIDNormalSampler(self.sample_shape, self.seed)(posterior)
        )
        return _make_comparisons(
            u,
            _comparison_pairs(u.shape[-1], self.max_num_comparisons, self.seed),
        )


class PairwiseSobolQMCNormalSampler(struct.PyTreeNode):
    """Pairwise-comparison sampler over scrambled-Sobol qMC utility draws
    (reference `pairwise_samplers.py:110`)."""

    sample_shape: tuple = struct.field(pytree_node=False, default=(128,))
    seed: int = struct.field(pytree_node=False, default=0)
    max_num_comparisons: Optional[int] = struct.field(
        pytree_node=False, default=None
    )

    def __call__(self, posterior) -> Array:
        u = _utility_samples(
            SobolQMCNormalSampler(self.sample_shape, self.seed)(posterior)
        )
        return _make_comparisons(
            u,
            _comparison_pairs(u.shape[-1], self.max_num_comparisons, self.seed),
        )


class ListSampler(struct.PyTreeNode):
    """One sampler per posterior in a list (reference
    `list_sampler.py:21`), for `ModelListGP`-style posteriors."""

    samplers: tuple = struct.field(pytree_node=False, default=())

    def __call__(self, posteriors: Sequence) -> list:
        return [s(p) for s, p in zip(self.samplers, posteriors)]


def get_sampler(posterior, sample_shape: tuple, seed: int = 0):
    """Default sampler choice (reference `sampling/get_sampler.py`):
    Sobol qMC when the base-sample dimension is within the Sobol table,
    i.i.d. otherwise."""
    d = math.prod(posterior.base_sample_shape)
    if d <= 1111:  # scipy Joe-Kuo table width
        return SobolQMCNormalSampler(sample_shape=sample_shape, seed=seed)
    return IIDNormalSampler(sample_shape=sample_shape, seed=seed)
