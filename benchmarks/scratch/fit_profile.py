"""Decompose the n=10240 MLL fit cost: forward, grad, kernel build."""
import time
import jax, jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
n, d = 10240, 10
X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
Y = (-jnp.sum((X - 0.4) ** 2, -1) + 0.01 * jnp.asarray(rng.normal(size=n), jnp.float32))

from botorch_tpu.models.gp import make_gp
m = make_gp(X, Y[:, None])

def timeit(f, *a, reps=3):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps

mll = jax.jit(lambda p: m.replace(params=p).mll())
p0 = m.params
print("mll fwd      %.1f ms" % (timeit(mll, p0)*1e3), flush=True)
g = jax.jit(jax.value_and_grad(lambda p: m.replace(params=p).mll()))
print("mll val+grad %.1f ms" % (timeit(g, p0)*1e3), flush=True)

# kernel matrix build alone
from botorch_tpu.ops import kernels as K
kfn = jax.jit(lambda ls: K.kernel_fn("rbf")(X, X, ls))
ls = jnp.ones((1, d))
print("K build      %.1f ms" % (timeit(kfn, ls)*1e3), flush=True)
chol = jax.jit(jnp.linalg.cholesky)
A = kfn(ls) + 0.1*jnp.eye(n)
print("chol         %.1f ms" % (timeit(chol, A)*1e3), flush=True)
# full fit for reference
from botorch_tpu.fit import fit_gp
fitf = jax.jit(lambda k: fit_gp(m, k, num_restarts=2, maxiter=25).params)
print("fit 2x25     %.2f s" % timeit(fitf, jax.random.PRNGKey(0), reps=1), flush=True)
