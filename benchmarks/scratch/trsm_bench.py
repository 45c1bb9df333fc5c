"""Is XLA's triangular_solve the fit-gradient bottleneck, and can a
blocked-matmul TRSM beat it? n=10240 f32."""
import time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

P = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)
n = 10240
A_np = rng.normal(size=(n, n)).astype(np.float32)
A = jnp.asarray(A_np @ A_np.T / n + 2.0 * np.eye(n, dtype=np.float32))
L = jax.jit(jnp.linalg.cholesky)(A)
B = jnp.eye(n, dtype=jnp.float32)

def timeit(f, *a, reps=3):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

trsm = jax.jit(lambda L, B: jax.lax.linalg.triangular_solve(
    L, B, left_side=True, lower=True))
try:
    t = timeit(trsm, L, B)
    print(f"lax trsm (L^-1 I)        {t*1e3:8.1f} ms", flush=True)
except Exception as e:  # confirmed r5: OOM — 15.7 GB of row-panel temps
    print(f"lax trsm (L^-1 I)        FAILED: {str(e)[:120]}", flush=True)

def blocked_trsm(L, B, nb=1024):
    """X = L^-1 B: blocked forward substitution, updates on the MXU."""
    n = L.shape[-1]
    X = jnp.zeros_like(B)
    for k0 in range(0, n, nb):
        Bk = B[k0:k0+nb] - (
            jnp.dot(L[k0:k0+nb, :k0], X[:k0], precision=P)
            if k0 else 0.0)
        Xk = jax.lax.linalg.triangular_solve(
            L[k0:k0+nb, k0:k0+nb], Bk, left_side=True, lower=True)
        X = X.at[k0:k0+nb].set(Xk)
    return X

for nb in (512, 1024, 2048):
    f = jax.jit(partial(blocked_trsm, nb=nb))
    X = f(L, B)
    err = float(jnp.max(jnp.abs(jnp.dot(L, X, precision=P) - B)))
    t = timeit(f, L, B)
    print(f"blocked trsm nb={nb:5d}     {t*1e3:8.1f} ms  err={err:.2e}", flush=True)

# the actual chol VJP cost
g = jax.jit(jax.grad(lambda A: jnp.sum(jnp.linalg.cholesky(A) ** 2)))
print(f"grad through chol        {timeit(g, A)*1e3:8.1f} ms", flush=True)
