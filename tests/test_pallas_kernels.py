"""Parity tests for the fused Pallas kernel-matrix ops against the jnp/XLA
reference implementations. The Pallas path only exists on TPU, so these
skip on the CPU suite backend; run them directly on a TPU box with
`python -m pytest tests/test_pallas_kernels.py` (no conftest CPU pin? the
conftest pins CPU — use `python tests/test_pallas_kernels.py` instead,
which self-executes on the default backend)."""

import os
import sys

# self-exec (`python tests/test_pallas_kernels.py`) puts tests/ on
# sys.path, not the repo root — bootstrap the package path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _parity(kind: str, n: int, m: int, d: int, seed: int = 0) -> float:
    from botorch_tpu.ops import kernels as K
    from botorch_tpu.ops.pallas_kernels import _PALLAS_OPS

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    z = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    ls = jnp.asarray(rng.uniform(0.2, 1.5, size=(d,)), jnp.float32)
    ref = np.asarray(K.KERNELS[kind](x, z, ls))
    out = np.asarray(_PALLAS_OPS[kind](x, z, ls))
    return float(np.abs(out - ref).max())


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernels are TPU-only"
)
@pytest.mark.parametrize("kind", ["rbf", "matern52", "matern32", "matern12"])
def test_pallas_kernel_matrix_parity(kind):
    # non-multiple-of-tile shapes exercise the padding/masking path
    assert _parity(kind, 300, 257, 7) < 1e-5


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernels are TPU-only"
)
def test_dispatch_uses_pallas_above_threshold():
    from botorch_tpu.ops.kernels import kernel_fn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(300, 4)), jnp.float32)
    ls = jnp.full((4,), 0.5, jnp.float32)
    out = kernel_fn("matern52")(x, x, ls)
    from botorch_tpu.ops.kernels import matern52

    assert np.abs(np.asarray(out) - np.asarray(matern52(x, x, ls))).max() < 1e-5


if __name__ == "__main__":
    # direct TPU run (bypasses the CPU-pinning conftest)
    for kind in ("rbf", "matern52", "matern32", "matern12"):
        err = _parity(kind, 300, 257, 7)
        print(f"{kind}: max abs err {err:.2e}")
        assert err < 1e-5, kind
    print("pallas kernel parity OK on", jax.default_backend())
