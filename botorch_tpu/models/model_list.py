r"""Model lists: independent sub-models over possibly different data.

Counterpart of `botorch/models/model_list_gp_regression.py:24`
(`ModelListGP`) + `botorch/posteriors/posterior_list.py` (`PosteriorList`)
+ the converters (`models/converter.py:137-360`).

`ModelList` joins single-output models into one multi-output interface:
`posterior` evaluates each sub-model and stacks, so the whole acquisition
stack (ScalarizedPosteriorMean, constrained acqfs, qNEHVI) can consume it.
When all sub-models share train inputs, `model_list_to_batched` converts
to one batched `SingleTaskGP` (single fused Cholesky per output batch —
the preferred TPU layout); `batched_to_model_list` is the inverse.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from botorch_tpu.models.gp import GPParams, SingleTaskGP
from botorch_tpu.posteriors.gaussian import GaussianPosterior

Array = jax.Array


class ModelList(struct.PyTreeNode):
    """Tuple of independent single-output models with a joint posterior."""

    models: tuple = ()

    @property
    def num_outputs(self) -> int:
        return sum(m.num_outputs for m in self.models)

    @property
    def batch_shape(self):
        return self.models[0].batch_shape

    def posterior(self, Xq: Array, observation_noise: bool = False, cache=None):
        posts = [
            m.posterior(
                Xq, observation_noise=observation_noise,
                cache=None if cache is None else cache[i],
            )
            for i, m in enumerate(self.models)
        ]
        mean = jnp.concatenate([p.mean for p in posts], axis=-1)
        cov = jnp.concatenate([p.cov for p in posts], axis=-3)
        return GaussianPosterior(mean=mean, cov=cov)

    def train_chol(self):
        return tuple(m.train_chol() for m in self.models)

    def condition_on_observations(self, X: Array, Y: Array) -> "ModelList":
        new = []
        idx = 0
        for m in self.models:
            k = m.num_outputs
            new.append(m.condition_on_observations(X, Y[..., idx : idx + k]))
            idx += k
        return ModelList(models=tuple(new))

    def subset_output(self, idcs: Sequence[int]) -> "ModelList":
        return ModelList(models=tuple(self.models[i] for i in idcs))


class ModelDict(struct.PyTreeNode):
    """Lightweight container mapping model names to models (reference
    `models/model.py:684` `ModelDict`). No joint posterior — access
    sub-models by name; any model type (incl. ModelList) is accepted.
    Registered as a pytree, so it jits/vmaps like every other container.
    """

    models: dict = struct.field(default_factory=dict)

    def __getitem__(self, name: str):
        return self.models[name]

    def __contains__(self, name: str) -> bool:
        return name in self.models

    def __len__(self) -> int:
        return len(self.models)

    def __iter__(self):
        return iter(self.models)

    def keys(self):
        return self.models.keys()

    def values(self):
        return self.models.values()

    def items(self):
        return self.models.items()


def model_list_to_batched(model_list: ModelList) -> SingleTaskGP:
    """Convert same-X single-output models to one batched model
    (reference `converter.py:137`)."""
    ms = model_list.models
    X0 = ms[0].X
    for m in ms:
        if m.X.shape != X0.shape:
            raise ValueError("model_list_to_batched requires identical train X")
        if m.kernel != ms[0].kernel:
            raise ValueError("kernels must match")
    # kernel mixture weights carry the output axis LAST ((w, m) layout),
    # unlike the other fields — concatenate them separately
    kw = None
    if ms[0].params.raw_kernel_weights is not None:
        kw = jnp.concatenate(
            [m.params.raw_kernel_weights for m in ms], axis=-1
        )
    params = jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0),
        *(m.params.replace(raw_kernel_weights=None) for m in ms),
    ).replace(raw_kernel_weights=kw)
    Yvar = (
        None
        if ms[0].Yvar is None
        else jnp.concatenate([m.Yvar for m in ms], axis=-1)
    )
    return SingleTaskGP(
        X=X0,
        Y=jnp.concatenate([m.Y for m in ms], axis=-1),
        params=params,
        Y_loc=jnp.concatenate([m.Y_loc for m in ms]),
        Y_scale=jnp.concatenate([m.Y_scale for m in ms]),
        Yvar=Yvar,
        mask=ms[0].mask,
        kernel=ms[0].kernel,
        use_outputscale=ms[0].use_outputscale,
    )


def batched_to_model_list(model: SingleTaskGP) -> ModelList:
    """Inverse of `model_list_to_batched` (reference `converter.py:274`)."""
    models = []
    for i in range(model.num_outputs):
        params = GPParams(
            mean=model.params.mean[..., i : i + 1],
            raw_lengthscale=model.params.raw_lengthscale[..., i : i + 1, :],
            raw_outputscale=model.params.raw_outputscale[..., i : i + 1],
            raw_noise=model.params.raw_noise[..., i : i + 1],
            raw_kernel_weights=(
                None
                if model.params.raw_kernel_weights is None
                else model.params.raw_kernel_weights[..., i : i + 1]
            ),
        )
        models.append(
            model.replace(
                Y=model.Y[..., i : i + 1],
                params=params,
                Y_loc=model.Y_loc[i : i + 1],
                Y_scale=model.Y_scale[i : i + 1],
                Yvar=None if model.Yvar is None else model.Yvar[..., i : i + 1],
            )
        )
    return ModelList(models=tuple(models))
