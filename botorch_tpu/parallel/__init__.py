"""Mesh/sharding re-exports (TPU-native; no reference counterpart — SURVEY §2.10)."""

from botorch_tpu.parallel.distributed_chol import (
    distributed_cholesky,
    distributed_gp_solve,
)
from botorch_tpu.parallel.multihost import (
    dcn_restart_sharder,
    init_multihost,
    make_multihost_mesh,
)
from botorch_tpu.parallel.sharding import (
    leading_axis_sharder,
    make_mesh,
    replicated,
)

__all__ = [
    "dcn_restart_sharder",
    "distributed_cholesky",
    "distributed_gp_solve",
    "init_multihost",
    "make_multihost_mesh",
    "leading_axis_sharder",
    "make_mesh",
    "replicated",
]
