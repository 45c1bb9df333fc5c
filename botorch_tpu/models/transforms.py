r"""Input and outcome transforms.

Counterpart of `botorch/models/transforms/input.py` (`Normalize :490`,
`InputStandardize :640`, `Round :719` STE rounding, `Log10 :866`,
`Warp :922` Kumaraswamy, `AppendFeatures :1077`, `FilterFeatures :1245`,
`InputPerturbation :1316`, `OneHotToNumeric :1444`,
`ChainedInputTransform :158`) and `transforms/outcome.py`
(`Standardize :217` — built into `make_gp` — `Log :450`, `Power :578`,
`Bilog :705`, `ChainedOutcomeTransform :129`).

Transforms are immutable pytree dataclasses with pure
`transform`/`untransform`; learnable ones (`Warp`) expose their raw
parameters as pytree leaves so they ride along with model fitting.
`TransformedModel` wraps any model so the acquisition layer sees original
coordinates (`InputTransform.preprocess_transform` contract,
`models/transforms/input.py:39-158`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


# --------------------------------------------------------------------------- #
# Input transforms
# --------------------------------------------------------------------------- #
class Normalize(struct.PyTreeNode):
    """Min-max scale selected dims to [0, 1] (`input.py:490`)."""

    bounds: Array  # (2, d)
    indices: Optional[tuple] = struct.field(pytree_node=False, default=None)

    def transform(self, X: Array) -> Array:
        lo, hi = self.bounds[0], self.bounds[1]
        Xt = (X - lo) / (hi - lo)
        if self.indices is not None:
            keep = jnp.zeros(X.shape[-1], bool).at[jnp.asarray(self.indices)].set(True)
            Xt = jnp.where(keep, Xt, X)
        return Xt

    def untransform(self, X: Array) -> Array:
        lo, hi = self.bounds[0], self.bounds[1]
        Xu = X * (hi - lo) + lo
        if self.indices is not None:
            keep = jnp.zeros(X.shape[-1], bool).at[jnp.asarray(self.indices)].set(True)
            Xu = jnp.where(keep, Xu, X)
        return Xu


class InputStandardize(struct.PyTreeNode):
    """Zero-mean/unit-variance input scaling (`input.py:640`)."""

    loc: Array  # (d,)
    scale: Array  # (d,)

    @classmethod
    def fit(cls, X: Array) -> "InputStandardize":
        return cls(
            loc=jnp.mean(X, axis=0),
            scale=jnp.std(X, axis=0) + 1e-8,
        )

    def transform(self, X: Array) -> Array:
        return (X - self.loc) / self.scale

    def untransform(self, X: Array) -> Array:
        return X * self.scale + self.loc


def ste_round(X: Array) -> Array:
    """Straight-through-estimator round: identity gradient
    (`utils/rounding.py:108` semantics)."""
    return X + jax.lax.stop_gradient(jnp.round(X) - X)


class Round(struct.PyTreeNode):
    """Round integer dims with STE gradients (`input.py:719`)."""

    integer_indices: tuple = struct.field(pytree_node=False, default=())

    def transform(self, X: Array) -> Array:
        if not self.integer_indices:
            return X
        mask = jnp.zeros(X.shape[-1], bool).at[
            jnp.asarray(self.integer_indices)
        ].set(True)
        return jnp.where(mask, ste_round(X), X)

    def untransform(self, X: Array) -> Array:
        return X


class Log10(struct.PyTreeNode):
    """log10 on selected dims (`input.py:866`)."""

    indices: tuple = struct.field(pytree_node=False, default=())

    def _mask(self, d):
        return jnp.zeros(d, bool).at[jnp.asarray(self.indices)].set(True)

    def transform(self, X: Array) -> Array:
        m = self._mask(X.shape[-1])
        return jnp.where(m, jnp.log10(jnp.maximum(X, 1e-20)), X)

    def untransform(self, X: Array) -> Array:
        m = self._mask(X.shape[-1])
        return jnp.where(m, jnp.power(10.0, X), X)


class Warp(struct.PyTreeNode):
    """Learnable Kumaraswamy CDF input warp on [0, 1] dims
    (`input.py:922`): `x -> 1 - (1 - x^a)^b` with `a, b > 0`."""

    raw_a: Array  # (d,) log-concentration a
    raw_b: Array  # (d,) log-concentration b
    eps: float = struct.field(pytree_node=False, default=1e-7)

    @classmethod
    def init(cls, d: int) -> "Warp":
        return cls(raw_a=jnp.zeros((d,)), raw_b=jnp.zeros((d,)))

    @property
    def a(self) -> Array:
        return jnp.exp(self.raw_a)

    @property
    def b(self) -> Array:
        return jnp.exp(self.raw_b)

    def transform(self, X: Array) -> Array:
        Xc = jnp.clip(X, self.eps, 1.0 - self.eps)
        return 1.0 - jnp.power(1.0 - jnp.power(Xc, self.a), self.b)

    def untransform(self, X: Array) -> Array:
        Xc = jnp.clip(X, self.eps, 1.0 - self.eps)
        return jnp.power(1.0 - jnp.power(1.0 - Xc, 1.0 / self.b), 1.0 / self.a)

    def log_prior(self) -> Array:
        """LogNormal(0, 0.75) priors on both concentrations (reference
        default)."""
        z_a = self.raw_a / 0.75
        z_b = self.raw_b / 0.75
        return -0.5 * (jnp.sum(z_a**2) + jnp.sum(z_b**2))


class AppendFeatures(struct.PyTreeNode):
    """Append fixed feature values to every candidate (`input.py:1077`)."""

    values: Array  # (k,) appended feature values

    def transform(self, X: Array) -> Array:
        tail = jnp.broadcast_to(self.values, (*X.shape[:-1], self.values.shape[-1]))
        return jnp.concatenate([X, tail], axis=-1)

    def untransform(self, X: Array) -> Array:
        return X[..., : -self.values.shape[-1]]


class FilterFeatures(struct.PyTreeNode):
    """Keep only the given feature indices (`input.py:1245`)."""

    indices: tuple = struct.field(pytree_node=False, default=())

    def transform(self, X: Array) -> Array:
        return X[..., jnp.asarray(self.indices)]

    def untransform(self, X: Array) -> Array:
        raise NotImplementedError("FilterFeatures is not invertible")


class InputPerturbation(struct.PyTreeNode):
    """Robust-BO perturbation set: evaluate each candidate at `X + delta_i`
    (`input.py:1316`); expands the q dimension by `n_p`."""

    perturbation_set: Array  # (n_p, d)

    def transform(self, X: Array) -> Array:
        expanded = X[..., :, None, :] + self.perturbation_set
        return expanded.reshape(*X.shape[:-2], -1, X.shape[-1])

    def untransform(self, X: Array) -> Array:
        n_p = self.perturbation_set.shape[0]
        return X[..., ::n_p, :]


class OneHotToNumeric(struct.PyTreeNode):
    """Map one-hot categorical blocks to numeric category indices
    (`input.py:1444`). `categorical_features`: {start_idx: cardinality}."""

    categorical_features: tuple = struct.field(pytree_node=False, default=())
    # tuple of (start, cardinality), applied to the one-hot layout

    def transform(self, X: Array) -> Array:
        out = []
        pos = 0
        blocks = dict(self.categorical_features)
        d = X.shape[-1]
        while pos < d:
            if pos in blocks:
                card = blocks[pos]
                out.append(
                    jnp.argmax(X[..., pos : pos + card], axis=-1).astype(X.dtype)[
                        ..., None
                    ]
                )
                pos += card
            else:
                out.append(X[..., pos : pos + 1])
                pos += 1
        return jnp.concatenate(out, axis=-1)

    def untransform(self, X: Array) -> Array:
        """Numeric categories -> one-hot blocks (inverse of `transform`)."""
        blocks = dict(self.categorical_features)
        out = []
        onehot_pos = 0
        col = 0
        d_onehot = (max(blocks) + blocks[max(blocks)]) if blocks else 0
        total_numeric = X.shape[-1]
        while col < total_numeric:
            if onehot_pos in blocks:
                card = blocks[onehot_pos]
                idx = X[..., col].astype(jnp.int32)
                out.append(jax.nn.one_hot(idx, card, dtype=X.dtype))
                onehot_pos += card
            else:
                out.append(X[..., col : col + 1])
                onehot_pos += 1
            col += 1
        return jnp.concatenate(out, axis=-1)


class ChainedInputTransform(struct.PyTreeNode):
    """Apply transforms in sequence (`input.py:158`)."""

    transforms: tuple = ()

    def transform(self, X: Array) -> Array:
        for t in self.transforms:
            X = t.transform(X)
        return X

    def untransform(self, X: Array) -> Array:
        for t in reversed(self.transforms):
            X = t.untransform(X)
        return X


# --------------------------------------------------------------------------- #
# Outcome transforms (beyond the built-in Standardize)
# --------------------------------------------------------------------------- #
class Log(struct.PyTreeNode):
    """`y -> log(y)` (`outcome.py:450`). Posterior untransform is handled
    sample-wise (TransformedPosterior semantics)."""

    def transform(self, Y: Array) -> Array:
        return jnp.log(jnp.maximum(Y, 1e-20))

    def untransform(self, Y: Array) -> Array:
        return jnp.exp(Y)


class Power(struct.PyTreeNode):
    """`y -> y^p` (`outcome.py:578`)."""

    power: float = struct.field(pytree_node=False, default=2.0)

    def transform(self, Y: Array) -> Array:
        return jnp.sign(Y) * jnp.power(jnp.abs(Y), self.power)

    def untransform(self, Y: Array) -> Array:
        return jnp.sign(Y) * jnp.power(jnp.abs(Y), 1.0 / self.power)


class Bilog(struct.PyTreeNode):
    """`y -> sign(y) log(1 + |y|)` — magnifies near zero, useful for
    constraints (`outcome.py:705`)."""

    def transform(self, Y: Array) -> Array:
        return jnp.sign(Y) * jnp.log1p(jnp.abs(Y))

    def untransform(self, Y: Array) -> Array:
        return jnp.sign(Y) * jnp.expm1(jnp.abs(Y))


class ChainedOutcomeTransform(struct.PyTreeNode):
    transforms: tuple = ()

    def transform(self, Y: Array) -> Array:
        for t in self.transforms:
            Y = t.transform(Y)
        return Y

    def untransform(self, Y: Array) -> Array:
        for t in reversed(self.transforms):
            Y = t.untransform(Y)
        return Y


# --------------------------------------------------------------------------- #
class TransformedModel(struct.PyTreeNode):
    """Wrap a model so callers work in untransformed input coordinates.

    Posterior/acquisition evaluation applies `input_transform.transform`
    before delegating; sampled outcomes pass through
    `outcome_transform.untransform` when given (a `TransformedPosterior`,
    reference `posteriors/transformed.py`)."""

    model: object
    input_transform: object = None
    # NOTE: outcome transforms that aren't affine change the posterior
    # family; downstream MC acqfs should apply them to samples instead.

    def posterior(self, Xq: Array, **kwargs):
        if self.input_transform is not None:
            Xq = self.input_transform.transform(Xq)
        return self.model.posterior(Xq, **kwargs)

    def train_chol(self):
        return self.model.train_chol()

    @property
    def num_outputs(self):
        return self.model.num_outputs

    @property
    def batch_shape(self):
        return self.model.batch_shape

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "model"), name)


# --------------------------------------------------------------------------- #
# Rounding helpers + factory (reference `utils/rounding.py`,
# `models/transforms/factory.py:125`)
# --------------------------------------------------------------------------- #
def approximate_round(X: Array, tau: float = 1e-3) -> Array:
    """Differentiable piecewise-tanh rounding
    (reference `utils/rounding.py:27-45`)."""
    offset = jnp.floor(X)
    rounding_component = (jnp.tanh((X - offset - 0.5) / tau) + 1.0) / 2.0
    return offset + rounding_component


def one_hot_argmax_ste(X: Array) -> Array:
    """STE one-hot argmax over the last dim (reference
    `utils/rounding.py` `OneHotArgmaxSTE`): hard one-hot forward,
    identity gradient."""
    hard = jax.nn.one_hot(jnp.argmax(X, axis=-1), X.shape[-1], dtype=X.dtype)
    return X + jax.lax.stop_gradient(hard - X)


class RoundSTE(struct.PyTreeNode):
    """Integer + one-hot-categorical rounding with STE (or tanh-
    approximate) gradients (reference `transforms/input.py:719` `Round`).

    `categorical_features`: tuple of `(start, cardinality)` one-hot blocks.
    """

    integer_indices: tuple = struct.field(pytree_node=False, default=())
    categorical_features: tuple = struct.field(pytree_node=False, default=())
    approximate: bool = struct.field(pytree_node=False, default=False)
    tau: float = struct.field(pytree_node=False, default=1e-3)

    def transform(self, X: Array) -> Array:
        if self.integer_indices:
            rnd = (
                approximate_round(X, self.tau)
                if self.approximate
                else ste_round(X)
            )
            mask = (
                jnp.zeros(X.shape[-1], bool)
                .at[jnp.asarray(self.integer_indices)]
                .set(True)
            )
            X = jnp.where(mask, rnd, X)
        for start, card in self.categorical_features:
            block = X[..., start : start + card]
            if self.approximate:
                block = jax.nn.softmax(block / self.tau, axis=-1)
            else:
                block = one_hot_argmax_ste(block)
            X = jnp.concatenate(
                [X[..., :start], block, X[..., start + card :]], axis=-1
            )
        return X

    def untransform(self, X: Array) -> Array:
        return X


def get_rounding_input_transform(
    one_hot_bounds: Array,
    integer_indices: Optional[tuple] = None,
    categorical_features: Optional[tuple] = None,
    initialization: bool = False,
    return_numeric: bool = False,
    approximate: bool = False,
) -> ChainedInputTransform:
    """Unit-cube -> raw space -> round -> unit-cube chained transform
    (reference `models/transforms/factory.py:21-125`).

    Args:
        one_hot_bounds: `(2, d)` raw bounds with categoricals one-hot.
        integer_indices: indices of integer dims (contiguous ranges).
        categorical_features: tuple of `(start, cardinality)` blocks.
        initialization: widen integer bounds by ±(0.5 - ε) so the
            initializer's rounded values cover the extreme integers
            uniformly (reference `:99-107`).
        return_numeric: append a OneHotToNumeric collapse at the end.
        approximate: use tanh-approximate rounding instead of STE.
    """
    integer_indices = tuple(integer_indices or ())
    categorical_features = tuple(categorical_features or ())
    bounds = jnp.asarray(one_hot_bounds, jnp.float32)
    if initialization and integer_indices:
        idx = jnp.asarray(integer_indices)
        bounds = bounds.at[0, idx].add(-0.4999).at[1, idx].add(0.4999)
    chain = [
        _Unnormalize(bounds=bounds),
        RoundSTE(
            integer_indices=integer_indices,
            categorical_features=categorical_features,
            approximate=approximate,
        ),
        Normalize(bounds=jnp.asarray(one_hot_bounds, jnp.float32)),
    ]
    if return_numeric and categorical_features:
        chain.append(
            OneHotToNumeric(categorical_features=categorical_features)
        )
    return ChainedInputTransform(transforms=tuple(chain))


class _Unnormalize(struct.PyTreeNode):
    """Inverse of `Normalize` as a forward transform (factory internal)."""

    bounds: Array

    def transform(self, X: Array) -> Array:
        return Normalize(bounds=self.bounds).untransform(X)

    def untransform(self, X: Array) -> Array:
        return Normalize(bounds=self.bounds).transform(X)


# --------------------------------------------------------------------------- #
# Log-normal <-> normal moment maps (reference `models/transforms/utils.py`
# `lognorm_to_norm`, `norm_to_lognorm`, `norm_to_lognorm_mean/_variance`)
# --------------------------------------------------------------------------- #
def norm_to_lognorm_mean(mu: Array, var: Array) -> Array:
    """`E[exp(X)] = exp(mu + var / 2)` (reference `transforms/utils.py`)."""
    return jnp.exp(mu + var / 2.0)


def norm_to_lognorm_variance(mu: Array, var: Array) -> Array:
    """`Var[exp(X)] = exp(2 mu + var) (exp(var) - 1)`."""
    return jnp.exp(2.0 * mu + var) * (jnp.exp(var) - 1.0)


def norm_to_lognorm(mu: Array, Cov: Array) -> tuple[Array, Array]:
    """Moments of `exp(X)` for `X ~ N(mu, Cov)` (reference
    `transforms/utils.py` `norm_to_lognorm`)."""
    diag = jnp.diagonal(Cov, axis1=-2, axis2=-1)
    b = mu + 0.5 * diag
    mu_ln = jnp.exp(b)
    Cov_ln = (jnp.exp(Cov) - 1.0) * jnp.exp(b[..., :, None] + b[..., None, :])
    return mu_ln, Cov_ln


def lognorm_to_norm(mu: Array, Cov: Array) -> tuple[Array, Array]:
    """Moments of `log(Y)` for log-normal `Y` with moments `(mu, Cov)`
    (reference `transforms/utils.py` `lognorm_to_norm`)."""
    Cov_n = jnp.log1p(Cov / (mu[..., :, None] * mu[..., None, :]))
    mu_n = jnp.log(mu) - 0.5 * jnp.diagonal(Cov_n, axis1=-2, axis2=-1)
    return mu_n, Cov_n
