"""Native (C++) box-decomposition engine tests: exact agreement with the
numpy reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.utils.multi_objective import (
    is_non_dominated,
    nondominated_hypercell_bounds_np,
)
from botorch_tpu.utils.native import decompose_batch_native, native_available

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


@needs_native
@pytest.mark.parametrize("m", [2, 3, 4])
def test_native_matches_numpy(m):
    rng = np.random.default_rng(m)
    fronts = []
    for _ in range(8):
        P = rng.uniform(0.1, 1, (6, m))
        P = P[np.asarray(is_non_dominated(jnp.asarray(P)))]
        fronts.append(P)
    ref = np.zeros(m)
    lo_c, up_c, counts = decompose_batch_native(fronts, ref, clip_max=1e8)
    for s, P in enumerate(fronts):
        lo_n, up_n = nondominated_hypercell_bounds_np(P, ref, clip_max=1e8)
        assert counts[s] == lo_n.shape[0]
        a = np.sort(np.concatenate([lo_n, up_n], -1), axis=0)
        b = np.sort(
            np.concatenate(
                [lo_c[s][: counts[s]], up_c[s][: counts[s]]], -1
            ),
            axis=0,
        )
        np.testing.assert_allclose(a, b, atol=1e-9)


@needs_native
def test_native_padding_is_zero_volume():
    rng = np.random.default_rng(0)
    fronts = [rng.uniform(0.3, 0.9, (3, 3)), rng.uniform(0.3, 0.9, (1, 3))]
    ref = np.zeros(3)
    lo, up, counts = decompose_batch_native(fronts, ref)
    for s in range(2):
        pad_lo = lo[s][counts[s]:]
        pad_up = up[s][counts[s]:]
        vol = np.prod(np.maximum(pad_up - pad_lo, 0), axis=-1)
        assert (vol == 0).all()


@needs_native
def test_native_empty_front_is_single_full_cell():
    lo, up, counts = decompose_batch_native(
        [np.zeros((0, 3))], np.zeros(3), clip_max=1e8
    )
    assert counts[0] == 1
    np.testing.assert_allclose(lo[0][0], 0.0)
    np.testing.assert_allclose(up[0][0], 1e8)


@needs_native
@pytest.mark.parametrize("m", [3, 4, 5])
def test_native_hypervolume_matches_numpy(m):
    from botorch_tpu.utils.multi_objective import dominated_hypervolume_np
    from botorch_tpu.utils.native import hypervolume_batch_native

    rng = np.random.default_rng(m)
    fronts = [rng.uniform(size=(12, m)) for _ in range(6)]
    # include an all-below-reference front and an empty front
    fronts.append(np.full((4, m), -1.0))
    fronts.append(np.zeros((0, m)))
    ref = np.zeros(m) - 0.1
    out = hypervolume_batch_native(fronts, ref)
    exp = np.array([dominated_hypervolume_np(f, ref) for f in fronts])
    np.testing.assert_allclose(out, exp, rtol=1e-9, atol=1e-12)
    assert out[-1] == 0.0


@needs_native
def test_hypervolume_dispatch_uses_native_value():
    from botorch_tpu.utils.multi_objective import (
        dominated_hypervolume_np,
        hypervolume,
    )

    rng = np.random.default_rng(7)
    Y = rng.uniform(size=(25, 3))
    ref = np.zeros(3)
    assert np.isclose(
        hypervolume(Y, ref), dominated_hypervolume_np(Y, ref), rtol=1e-9
    )
