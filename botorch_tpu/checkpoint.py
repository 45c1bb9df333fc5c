r"""Checkpoint / resume for BO state, models, and samplers.

The reference checkpoints via torch `state_dict` (`models/model.py:591`,
`fully_bayesian.py:461-494`); SURVEY §5 prescribes pytree checkpoints of
model state + MCMC draws + BO history for the TPU build. Because every
object in this framework (models, acquisition functions, `BOState`,
`TurboState`, NUTS draws) is an immutable pytree, checkpointing is just
pytree serialization — `flax.serialization` msgpack bytes with a structure
template on restore. Rollback across fit attempts (the reference's
`module_rollback_ctx`) is free: keep the old pytree.
"""

from __future__ import annotations

import os
from typing import TypeVar

import jax
from flax import serialization

T = TypeVar("T")


def save(path: str, pytree) -> None:
    """Serialize any framework pytree (BOState, SingleTaskGP, ...)."""
    data = serialization.to_bytes(pytree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic


def load(path: str, template: T) -> T:
    """Restore into the structure of `template` (an instance with the same
    pytree structure/shapes, e.g. a freshly constructed state)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_history(path: str, X, Y) -> None:
    """Plain-numpy BO history dump (portable across versions)."""
    import numpy as np

    np.savez(path, X=np.asarray(X), Y=np.asarray(Y))


def load_history(path: str):
    import numpy as np

    data = np.load(path)
    return data["X"], data["Y"]
