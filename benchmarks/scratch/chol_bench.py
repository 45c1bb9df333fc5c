"""Can a JAX-level blocked right-looking Cholesky beat lax.linalg.cholesky
on the chip at large n? Panel chol + wide TRSM + MXU syrk trailing update,
static Python-unrolled block loop."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

P = jax.lax.Precision.HIGHEST

def blocked_chol(A, nb=1024):
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for k0 in range(0, n, nb):
        Akk = A[k0:k0+nb, k0:k0+nb]
        Lkk = jnp.linalg.cholesky(Akk)
        L = L.at[k0:k0+nb, k0:k0+nb].set(Lkk)
        if k0 + nb < n:
            Ark = A[k0+nb:, k0:k0+nb]
            Lrk = jax.lax.linalg.triangular_solve(
                Lkk, Ark, left_side=False, lower=True, transpose_a=True)
            L = L.at[k0+nb:, k0:k0+nb].set(Lrk)
            Atr = A[k0+nb:, k0+nb:] - jnp.dot(Lrk, Lrk.T, precision=P)
            A = A.at[k0+nb:, k0+nb:].set(Atr)
    return L

def timeit(f, *a, reps=5):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

rng = np.random.default_rng(0)
for n in (4096, 8192, 16384):
    A_np = rng.normal(size=(n, n)).astype(np.float32)
    A = jnp.asarray(A_np @ A_np.T / n + 2.0 * np.eye(n, dtype=np.float32))
    flops = n**3 / 3
    t_ref = timeit(jax.jit(jnp.linalg.cholesky), A)
    print(f"n={n} lax.cholesky      {t_ref*1e3:8.1f} ms  {flops/t_ref/1e12:6.2f} TF/s", flush=True)
    for nb in (512, 1024, 2048):
        f = jax.jit(partial(blocked_chol, nb=nb))
        L = f(A)
        err = float(jnp.max(jnp.abs(jnp.dot(L, L.T, precision=P) - A)))
        t = timeit(f, A)
        print(f"n={n} blocked nb={nb:5d}  {t*1e3:8.1f} ms  {flops/t/1e12:6.2f} TF/s  err={err:.2e}", flush=True)
