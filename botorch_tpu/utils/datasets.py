r"""Dataset containers (counterpart of `botorch/utils/datasets.py`:
`SupervisedDataset :20`, `FixedNoiseDataset :152`, `RankingDataset :185`,
`MultiTaskDataset :278`). Plain pytree dataclasses with validation."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class SupervisedDataset(struct.PyTreeNode):
    """X/Y(/Yvar) with names, validated on construction."""

    X: Array  # (n, d)
    Y: Array  # (n, m)
    Yvar: Optional[Array] = None
    feature_names: tuple = struct.field(pytree_node=False, default=())
    outcome_names: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def make(cls, X, Y, Yvar=None, feature_names=None, outcome_names=None):
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        if Y.ndim == 1:
            Y = Y[:, None]
        if X.shape[0] != Y.shape[0]:
            raise ValueError(
                f"X and Y must have the same number of rows: {X.shape[0]} vs "
                f"{Y.shape[0]}"
            )
        if Yvar is not None:
            Yvar = jnp.asarray(Yvar)
            if Yvar.ndim == 1:
                Yvar = Yvar[:, None]
            if Yvar.shape != Y.shape:
                raise ValueError("Yvar must match Y's shape")
        fn = tuple(feature_names or (f"x{i}" for i in range(X.shape[-1])))
        on = tuple(outcome_names or (f"y{i}" for i in range(Y.shape[-1])))
        if len(fn) != X.shape[-1]:
            raise ValueError("feature_names length mismatch")
        if len(on) != Y.shape[-1]:
            raise ValueError("outcome_names length mismatch")
        return cls(X=X, Y=Y, Yvar=Yvar, feature_names=fn, outcome_names=on)

    @property
    def n(self) -> int:
        return self.X.shape[0]

    @property
    def dim(self) -> int:
        return self.X.shape[-1]


class FixedNoiseDataset(SupervisedDataset):
    """Dataset with mandatory observed noise (reference :152)."""

    @classmethod
    def make(cls, X, Y, Yvar, **kw):
        if Yvar is None:
            raise ValueError("FixedNoiseDataset requires Yvar")
        return super().make(X, Y, Yvar, **kw)


class RankingDataset(struct.PyTreeNode):
    """Pairwise/listwise comparisons: X indexed by comparison tuples
    (reference :185). `comparisons[i] = (winner_idx, loser_idx)`."""

    X: Array  # (n, d) items
    comparisons: Array  # (c, 2) int indices into X

    @property
    def n(self) -> int:
        return self.X.shape[0]


class MultiTaskDataset(struct.PyTreeNode):
    """Per-task datasets with a designated target task (reference :278)."""

    datasets: tuple = ()
    target_task: int = struct.field(pytree_node=False, default=0)

    def joint_X(self, task_feature_last: bool = True) -> Array:
        """Stack all tasks with the task id appended as a feature column."""
        blocks = []
        for t, ds in enumerate(self.datasets):
            tid = jnp.full((ds.n, 1), float(t), ds.X.dtype)
            blocks.append(jnp.concatenate([ds.X, tid], axis=-1))
        return jnp.concatenate(blocks, axis=0)

    def joint_Y(self) -> Array:
        return jnp.concatenate([ds.Y for ds in self.datasets], axis=0)


class ContextualDataset(struct.PyTreeNode):
    """Contextual-BO dataset (reference `datasets.py:496`): per-outcome
    datasets plus a context → feature-names decomposition (and optionally
    a context → metric-names decomposition for LCE-M style models).

    All sub-datasets must share X (the reference validates the same)."""

    datasets: tuple = ()
    parameter_decomposition: dict = struct.field(
        pytree_node=False, default_factory=dict
    )
    metric_decomposition: Optional[dict] = struct.field(
        pytree_node=False, default=None
    )

    @classmethod
    def make(cls, datasets, parameter_decomposition, metric_decomposition=None):
        datasets = tuple(datasets)
        if not datasets:
            raise ValueError("need at least one dataset")
        feat = datasets[0].feature_names
        for ds in datasets[1:]:
            if ds.feature_names != feat:
                raise ValueError("all datasets must share feature_names")
            if ds.X.shape != datasets[0].X.shape or not bool(
                jnp.allclose(ds.X, datasets[0].X)
            ):
                raise ValueError("all datasets must share the same X")
        named = set(
            n for names in parameter_decomposition.values() for n in names
        )
        if not named.issubset(set(feat)):
            raise ValueError(
                "parameter_decomposition names must be dataset features"
            )
        if metric_decomposition is not None:
            if set(metric_decomposition) != set(parameter_decomposition):
                raise ValueError(
                    "metric_decomposition must cover the same contexts"
                )
            outs = set(n for ds in datasets for n in ds.outcome_names)
            mnames = set(
                n for names in metric_decomposition.values() for n in names
            )
            if not mnames.issubset(outs):
                raise ValueError(
                    "metric_decomposition names must be dataset outcomes"
                )
        return cls(
            datasets=datasets,
            parameter_decomposition=dict(parameter_decomposition),
            metric_decomposition=(
                None
                if metric_decomposition is None
                else dict(metric_decomposition)
            ),
        )

    @property
    def X(self) -> Array:
        return self.datasets[0].X

    @property
    def context_names(self) -> tuple:
        return tuple(self.parameter_decomposition)

    def context_indices(self) -> dict:
        """Map context name -> feature-column indices (decomposed_fns)."""
        feat = list(self.datasets[0].feature_names)
        return {
            c: tuple(feat.index(n) for n in names)
            for c, names in self.parameter_decomposition.items()
        }

    def joint_Y(self) -> Array:
        return jnp.concatenate([ds.Y for ds in self.datasets], axis=-1)
