r"""Device-mesh sharding of BO work axes.

The reference is single-device; its batch axes are the sharding
opportunities on a TPU slice (SURVEY §2.10): acquisition restarts, model
refit restarts, NUTS chains, MC samples, and fantasy/ensemble batches all
sit on leading axes of vmapped computations here, so scaling out is purely
a matter of sharding those axes over a `jax.sharding.Mesh` and letting XLA
insert the collectives (argmax/psum reductions ride the ICI).

Usage:
    mesh = make_mesh()                       # all local devices
    shard = leading_axis_sharder(mesh)       # constraint fn for batch axes
    fit_gp(model, key, shard_fn=shard, ...)
    optimize_acqf(acqf, ..., shard_fn=shard)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

RESTART_AXIS = "restart"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = RESTART_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over local devices.

    Args:
        n_devices: keep only the first `n_devices` devices. Applies to an
            explicit `devices` list too (the list is truncated).
        axis_name: mesh axis name (default ``"restart"``).
        devices: explicit device list; defaults to ``jax.devices()``.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def leading_axis_sharder(mesh: Mesh, axis_name: str = RESTART_AXIS):
    """Returns `shard(x)` constraining `x`'s leading axis onto `axis_name`
    (all other axes replicated). Apply to restart/chain/sample batches
    inside jitted programs."""

    def shard(x: Array) -> Array:
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return shard


def replicated(mesh: Mesh):
    """Returns `rep(x)` forcing full replication (for small shared state)."""

    def rep(x: Array) -> Array:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*([None] * x.ndim)))
        )

    return rep
