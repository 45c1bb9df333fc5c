"""Tests for the fused batched MVN quad/logdet op (`ops/pallas_linalg`).

On the CPU suite backend the op runs its jnp fallback — these tests pin
the SEMANTICS (values, closed-form VJP, vmap composition). TPU-only
parity of the Pallas kernel against the fallback is gated like
`test_pallas_kernels.py`.
"""

import os
import sys

# self-exec (`python tests/test_pallas_linalg.py`) puts tests/ on
# sys.path, not the repo root — bootstrap the package path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.ops.pallas_linalg import _qd_jnp, mvn_quad_logdet


def _spd(B, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)
    r = rng.normal(size=(B, n)).astype(np.float32)
    return jnp.asarray(K), jnp.asarray(r)


def _reference(K, r):
    L = jnp.linalg.cholesky(K)
    w = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)[..., 0]
    quad = jnp.sum(w * w, -1)
    ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    return quad, ld


def test_values_match_cholesky_reference():
    K, r = _spd(7, 13)
    q, ld = mvn_quad_logdet(K, r)
    qr, ldr = _reference(K, r)
    np.testing.assert_allclose(q, qr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ld, ldr, rtol=1e-5, atol=1e-5)


def test_leading_batch_dims_flattened():
    K, r = _spd(6, 9)
    K2 = K.reshape(2, 3, 9, 9)
    r2 = r.reshape(2, 3, 9)
    q, ld = mvn_quad_logdet(K2, r2)
    assert q.shape == (2, 3) and ld.shape == (2, 3)
    q1, ld1 = mvn_quad_logdet(K, r)
    np.testing.assert_allclose(q.reshape(-1), q1, rtol=1e-6)


def test_closed_form_vjp_matches_autodiff():
    K, r = _spd(4, 8, seed=3)

    def via_op(K, r):
        q, ld = mvn_quad_logdet(K, r)
        return jnp.sum(q + 0.7 * ld)

    def via_chol(K, r):
        q, ld = _reference(K, r)
        return jnp.sum(q + 0.7 * ld)

    gK_a, gr_a = jax.grad(via_op, argnums=(0, 1))(K, r)
    gK_b, gr_b = jax.grad(via_chol, argnums=(0, 1))(K, r)
    np.testing.assert_allclose(gK_a, gK_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gr_a, gr_b, rtol=1e-4, atol=1e-5)


def test_vmap_collapses_into_lane_batch():
    # the NUTS / multi-restart pattern: vmap(value_and_grad(per_lane))
    K, r = _spd(5, 6, seed=1)

    def per_lane(K1, r1):
        q, ld = mvn_quad_logdet(K1, r1)
        return q + 0.5 * ld

    v, (gK, gr) = jax.vmap(
        jax.value_and_grad(per_lane, argnums=(0, 1))
    )(K, r)
    assert v.shape == (5,) and gK.shape == K.shape and gr.shape == r.shape
    qr, ldr = _reference(K, r)
    np.testing.assert_allclose(v, qr + 0.5 * ldr, rtol=1e-5, atol=1e-5)


def test_residuals_are_solves():
    K, r = _spd(3, 7, seed=2)
    quad, ld, alpha, kinv = _qd_jnp(K, r)
    # alpha = K^-1 r, Kinv = K^-1. The verification products are done in
    # float64 numpy so the check measures the op's accuracy, not the
    # TPU default-precision matmul of the test itself.
    K64 = np.asarray(K, np.float64)
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", K64, np.asarray(alpha, np.float64)),
        np.asarray(r), rtol=1e-3, atol=1e-3,
    )
    eye = np.broadcast_to(np.eye(7), (3, 7, 7))
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", K64, np.asarray(kinv, np.float64)),
        eye, rtol=1e-3, atol=1e-3,
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas path is TPU-only"
)
def test_pallas_parity_with_fallback():
    from botorch_tpu.ops.pallas_linalg import _qd_pallas

    K, r = _spd(32, 24, seed=4)
    q_p, ld_p, a_p, ki_p = _qd_pallas(K, r, 24)
    q_j, ld_j, a_j, ki_j = _qd_jnp(K, r)
    np.testing.assert_allclose(q_p, q_j, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ld_p, ld_j, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a_p, a_j, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ki_p, ki_j, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas path is TPU-only"
)
def test_pallas_at_max_n():
    """n = _MAX_N must compile and stay accurate (VMEM headroom check:
    the (64, 64, 128) input tile + unrolled recurrences live in VMEM)."""
    from botorch_tpu.ops.pallas_linalg import _MAX_N, _qd_pallas

    K, r = _spd(8, _MAX_N, seed=5)
    q_p, ld_p, a_p, ki_p = _qd_pallas(K, r, _MAX_N)
    K64 = np.asarray(K, np.float64)
    ki64 = np.linalg.inv(K64)
    a64 = np.linalg.solve(K64, np.asarray(r, np.float64)[..., None])[..., 0]
    L64 = np.linalg.cholesky(K64)
    ld64 = 2.0 * np.log(np.diagonal(L64, axis1=-2, axis2=-1)).sum(-1)
    np.testing.assert_allclose(np.asarray(ld_p), ld64, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a_p), a64, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ki_p), ki64, rtol=1e-3, atol=1e-5)


if __name__ == "__main__":
    # self-executing TPU parity check (conftest pins the suite to CPU)
    test_pallas_parity_with_fallback()
    test_pallas_at_max_n()
    print("pallas_linalg TPU parity OK")


def test_large_n_closed_form_vjp_matches_autodiff():
    """n > _MAX_N routes through `_qd_large`, whose r4 custom VJP
    (blocked triangular inverse + syrk) must match gradients computed by
    native autodiff through a plain Cholesky pipeline — including under
    vmap (the fit's restart axis) and at a non-multiple of the TRSM
    block size."""
    from botorch_tpu.ops.pallas_linalg import _MAX_N

    n = _MAX_N + 17  # odd size: exercises the partial trailing block
    rng = np.random.default_rng(5)
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + 2.0 * np.eye(n, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def via_op(K, r):
        q, ld = mvn_quad_logdet(K, r)
        return jnp.sum(q + 0.7 * ld)

    def via_chol(K, r):
        L = jnp.linalg.cholesky(K)
        w = jax.scipy.linalg.solve_triangular(
            L, r[..., None], lower=True)[..., 0]
        q = jnp.sum(w * w, axis=-1)
        ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                           axis=-1)
        return jnp.sum(q + 0.7 * ld)

    gK_a, gr_a = jax.grad(via_op, argnums=(0, 1))(K, r)
    gK_b, gr_b = jax.grad(via_chol, argnums=(0, 1))(K, r)
    np.testing.assert_allclose(gK_a, gK_b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(gr_a, gr_b, rtol=2e-4, atol=2e-5)

    # batched via vmap (the MAP fit's restart axis)
    Kb = jnp.stack([K, K + 0.5 * jnp.eye(n)])
    rb = jnp.stack([r, 0.3 * r])
    gb = jax.vmap(jax.grad(via_op, argnums=(0, 1)))(Kb, rb)
    ge = [jax.grad(via_chol, argnums=(0, 1))(Kb[i], rb[i]) for i in range(2)]
    for i in range(2):
        np.testing.assert_allclose(gb[0][i], ge[i][0], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(gb[1][i], ge[i][1], rtol=2e-4, atol=2e-5)
