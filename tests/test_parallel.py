"""Multi-device sharding tests on the 8-virtual-device CPU mesh
(the TPU analogue of `test/test_cuda.py` — SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.ops.lbfgs import multi_start_lbfgsb
from botorch_tpu.parallel.sharding import leading_axis_sharder, make_mesh

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_8
def test_sharded_multistart_matches_unsharded():
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (8, 2)), jnp.float32
    )
    ref = multi_start_lbfgsb(rosen, x0, maxiter=200)
    mesh = make_mesh(8)
    shard = leading_axis_sharder(mesh)
    with mesh:
        res = jax.jit(
            lambda x: multi_start_lbfgsb(rosen, x, maxiter=200, shard_fn=shard)
        )(x0)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-4)


@needs_8
def test_sharded_fit_gp():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(12, 2)), jnp.float32)
    Y = jnp.asarray(np.sin(4 * np.asarray(X)).sum(-1), jnp.float32)
    mesh = make_mesh(8)
    shard = leading_axis_sharder(mesh)
    with mesh:
        fitted = fit_gp(
            make_gp(X, Y[:, None]), jax.random.PRNGKey(0),
            num_restarts=8, maxiter=30, shard_fn=shard,
        )
    assert float(fitted.mll()) >= float(make_gp(X, Y[:, None]).mll()) - 1e-3


@needs_8
def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)


@needs_8
def test_sharded_nuts_chains_match_unsharded():
    """NUTS chains are vmapped lanes (SURVEY §2.10): sharding the chain
    axis over the mesh partitions the lanes, and the pooled cross-chain
    adaptation reductions (mean accept prob, mass-matrix moments) become
    collectives. The partitioned program must compute the same chains."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from botorch_tpu.sampling.nuts import run_nuts

    k = 3

    def potential(z):  # correlated Gaussian
        d = z - jnp.asarray([1.0, -0.5, 0.25])
        A = jnp.asarray(
            [[2.0, 0.5, 0.0], [0.5, 1.5, 0.3], [0.0, 0.3, 1.0]]
        )
        return 0.5 * d @ A @ d

    z0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, k)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    run = lambda z: run_nuts(
        potential, z, key, num_warmup=64, num_samples=64, max_depth=5
    )
    samples_ref, _ = jax.jit(run)(z0)

    mesh = make_mesh(8)
    with mesh:
        z0_sharded = jax.device_put(
            z0, NamedSharding(mesh, P("restart", None))
        )
        samples_sh, _ = jax.jit(run)(z0_sharded)
    np.testing.assert_allclose(
        np.asarray(samples_sh), np.asarray(samples_ref), atol=5e-3
    )
    # statistical sanity: pooled mean near the target mean
    pooled = np.asarray(samples_sh).reshape(-1, k)
    assert np.abs(pooled.mean(0) - np.asarray([1.0, -0.5, 0.25])).max() < 0.25


def test_dryrun_multihost_two_processes():
    """Simulated multi-host: 2 jax.distributed processes (gloo CPU),
    restart axis farmed over a global (host, restart) mesh. The workers
    are separate processes, so this works regardless of the suite's
    in-process backend pinning."""
    import __graft_entry__

    __graft_entry__.dryrun_multihost(2, local_device_count=2)
