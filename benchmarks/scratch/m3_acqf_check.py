"""Acqf-correctness probe: on a bad-seed mid-run state, compare our
qLogNEHVI (in-graph Lacour cells) against an exact host-side MC estimate
of E[HVI] from the same fitted model, at several probe points."""
import sys
import jax, jax.numpy as jnp
import numpy as np

from botorch_tpu.acquisition.monte_carlo import draw_fresh_base_samples
from botorch_tpu.acquisition.multi_objective import (
    _subset_masks, make_in_graph_nehvi_cells,
    qLogNoisyExpectedHypervolumeImprovement)
from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp
from botorch_tpu.mo_loop import append_mo_observations, init_mo_state
from botorch_tpu.test_functions.multi_objective import DTLZ2
from botorch_tpu.utils.multi_objective import dominated_hypervolume_np

prob = DTLZ2(dim=4, num_objectives=3, negate=True)
ref = jnp.asarray(prob.ref_point, jnp.float32)
d, m, n_init, cap = 4, 3, 10, 40

# Recreate the it-13 situation from the bad seed-1 trajectory: init + the
# observed picks (we just refit on the diag trajectory's X rows).
state, X0 = init_mo_state(n_init, d, m, cap, seed=0)
state = append_mo_observations(state, X0, prob(X0))
rng = np.random.default_rng(5)
extra = jnp.asarray(np.clip(rng.uniform(size=(16, d)), 0, 1), jnp.float32)
# inject some corner-ish points like the bad run picks
extra = extra.at[0].set(jnp.asarray([1.,1.,1.,1.]))
extra = extra.at[1].set(jnp.asarray([0.,0.,0.,0.]))
state = append_mo_observations(state, extra, prob(extra))

mask = jnp.arange(cap) < state.n
model = make_gp(state.X, state.Y, mask=mask)
model = fit_gp(model, jax.random.PRNGKey(0), num_restarts=4, maxiter=40)
cache = model.train_chol()

nmc = 64
base = draw_fresh_base_samples(cap + 1, m, nmc, jax.random.PRNGKey(7), seed=23)
lo_c, up_c = make_in_graph_nehvi_cells(model, cache, state.X,
                                       base[:, :cap, :], ref,
                                       baseline_mask=mask)
masks, signs = _subset_masks(1)
acqf = qLogNoisyExpectedHypervolumeImprovement(
    model=model, cache=cache, base_samples=base, X_baseline=state.X,
    ref_point=ref, masks=masks, signs=signs, baseline_mask=mask,
    cell_lower=lo_c, cell_upper=up_c)

# probe points: corners, a mid-front gap point (x3=x4=0.5), random
probes = np.array([
    [1,1,1,1.], [0,0,0,1.], [0,0,0,0.],
    [0.5,0.5,0.5,0.5], [0.3,0.7,0.5,0.5], [0.8,0.2,0.5,0.5],
    [0.6,0.4,0.5,0.5], [0.25,0.25,0.5,0.5],
], np.float32)

# exact host-side MC estimate of E[HVI] with MANY joint samples
def exact_mc_hvi(xq, n_mc=512, key=11):
    Xa = jnp.concatenate([state.X, jnp.asarray(xq)[None]], 0)
    post = model.posterior(Xa, cache=cache)
    z = jax.random.normal(jax.random.PRNGKey(key), (n_mc, cap + 1, m))
    fs = np.asarray(post.rsample_from_base_samples(z))  # (n_mc, cap+1, m)
    msk = np.asarray(mask)
    vals = []
    for i in range(n_mc):
        fb = fs[i, :cap][msk]
        hv0 = dominated_hypervolume_np(fb, np.asarray(ref))
        hv1 = dominated_hypervolume_np(
            np.concatenate([fb, fs[i, cap:]], 0), np.asarray(ref))
        vals.append(hv1 - hv0)
    return float(np.mean(vals))

for p in probes:
    a = float(acqf(jnp.asarray(p)[None]))
    e = exact_mc_hvi(p)
    print(f"probe {p}: ours(log)={a:+.4f} -> {np.exp(a):.5f}  exactMC={e:.5f}",
          flush=True)
