"""Multi-chip sharding: restart axes over a device mesh + the distributed
blocked Cholesky for large-n exact GPs.

Run with a fake mesh on CPU:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/08_multichip_sharding.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu import fit_gp, make_gp
from botorch_tpu.parallel.distributed_chol import distributed_gp_solve
from botorch_tpu.parallel.sharding import leading_axis_sharder, make_mesh

mesh = make_mesh()  # all devices
shard = leading_axis_sharder(mesh)

rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(64, 4)), jnp.float32)
Y = jnp.sin(4 * X[:, 0]) + X[:, 1]

with mesh:
    # refit restarts sharded over the mesh
    model = fit_gp(make_gp(X, Y[:, None]), jax.random.PRNGKey(0),
                   num_restarts=len(jax.devices()), shard_fn=shard)
    # distributed factorization of a large kernel matrix
    K = np.asarray(model._kernel(
        jax.tree_util.tree_map(lambda a: a[..., 0], model.params).replace(
            raw_lengthscale=model.params.raw_lengthscale[0]
        ),
        model.X, model.X,
    )) + 0.01 * np.eye(64)
    L, alpha = distributed_gp_solve(
        jnp.asarray(K), model.Y[:, 0], mesh, jitter=1e-6
    )
print("fitted lengthscales:", np.asarray(model.params.lengthscale))
print("distributed solve residual:",
      float(jnp.abs(jnp.asarray(K) @ alpha - model.Y[:, 0]).max()))
