r"""Measured CPU baseline replicating the reference's compute path.

The reference stack (BoTorch 0.11.3 = torch + gpytorch + scipy) is not
installable in this container (no gpytorch/pyro wheels baked in), so this
script re-creates its EXACT computational pattern with torch + scipy to
measure a defensible `vs_baseline` denominator for `bench.py`:

  * exact GP with ARD RBF kernel, dim-scaled LogNormal lengthscale prior
    and LogNormal noise prior (`botorch/models/utils/gpytorch_modules.py:
    100-127`), outcome standardization (`gp_regression.py:130-222`);
  * MLL maximization through scipy L-BFGS-B over a flattened float64
    parameter vector with torch autograd gradients — the
    `NdarrayOptimizationClosure` pattern (`botorch/optim/closures/core.py:
    77`, `optim/core.py:55`);
  * analytic LogEI (`botorch/acquisition/analytic.py:356`);
  * `optimize_acqf`-style multi-start: Sobol raw samples, Boltzmann
    selection, one flattened scipy L-BFGS-B over all restarts jointly
    (`botorch/optim/optimize.py:397`, `generation/gen.py:46,194-267` —
    scipy sees ONE vector; the q/restart batch is flattened, exactly the
    CPU bottleneck the TPU build removes).

Budgets mirror bench.py (25 iterations, 10 init points, restarts 6,
raw 64, fit restarts ~ retry semantics, maxiter 35) so iters/s compare
like-for-like. Run: `python benchmarks/reference_cpu_baseline.py`.
"""

from __future__ import annotations

import json
import math
import time

import numpy as np
import torch
from scipy.optimize import minimize
from scipy.stats import qmc

torch.set_default_dtype(torch.float64)

BRANIN_OPT = 0.397887


def branin(x: torch.Tensor) -> torch.Tensor:
    # unit-cube input -> original domain (reference synthetic.py:181)
    x1 = x[..., 0] * 15.0 - 5.0
    x2 = x[..., 1] * 15.0
    a, b, c = 1.0, 5.1 / (4 * math.pi**2), 5.0 / math.pi
    r, s, t = 6.0, 10.0, 1.0 / (8 * math.pi)
    return -(a * (x2 - b * x1**2 + c * x1 - r) ** 2
             + s * (1 - t) * torch.cos(x1) + s)  # negated (maximize)


def _kernel(X1, X2, ls):
    d = torch.cdist(X1 / ls, X2 / ls).clamp_min(0.0)
    return torch.exp(-0.5 * d * d)


def _mll_loss(raw, X, Y, dim):
    """Negative log marginal likelihood + LogNormal priors
    (gpytorch_modules.py:100-127 constants)."""
    ls = torch.nn.functional.softplus(raw[:dim]) + 0.025
    noise = torch.nn.functional.softplus(raw[dim]) + 1e-4
    mean_c = raw[dim + 1]
    n = X.shape[0]
    K = _kernel(X, X, ls) + noise * torch.eye(n)
    L = torch.linalg.cholesky(K)
    resid = (Y - mean_c).unsqueeze(-1)
    alpha = torch.cholesky_solve(resid, L)
    nll = 0.5 * (resid * alpha).sum() + torch.log(torch.diagonal(L)).sum() \
        + 0.5 * n * math.log(2 * math.pi)
    # dim-scaled LogNormal(sqrt(2)+log(d)/2, sqrt(3)) lengthscale prior
    mu_ls = math.sqrt(2.0) + 0.5 * math.log(dim)
    lls = torch.log(ls)
    nll = nll + ((lls - mu_ls) ** 2 / (2 * 3.0) + lls).sum()
    lno = torch.log(noise)
    nll = nll + (lno + 2.0) ** 2 / (2 * 1.0) + lno
    return nll


def fit_gp_scipy(X, Y, maxiter=35, restarts=3, seed=0):
    """scipy L-BFGS-B over flattened float64 params with torch autograd
    grads (the reference's NdarrayOptimizationClosure round trip)."""
    dim = X.shape[1]
    rng = np.random.default_rng(seed)
    best = (np.inf, None)
    for r in range(restarts):
        x0 = rng.normal(0.0, 1.0, size=(dim + 2,))

        def f_np(v):
            raw = torch.tensor(v, requires_grad=True)
            loss = _mll_loss(raw, X, Y, dim)
            loss.backward()
            return float(loss.detach()), raw.grad.numpy().copy()

        res = minimize(f_np, x0, jac=True, method="L-BFGS-B",
                       options={"maxiter": maxiter})
        if res.fun < best[0]:
            best = (res.fun, res.x)
    raw = torch.tensor(best[1])
    ls = torch.nn.functional.softplus(raw[:dim]) + 0.025
    noise = torch.nn.functional.softplus(raw[dim]) + 1e-4
    return ls, noise, raw[dim + 1]


def log_ei(Xq, X, Y, ls, noise, mean_c, best_f):
    """Analytic LogEI (analytic.py:356,416): stable via log_ndtr asymptotics
    handled by torch.special."""
    n = X.shape[0]
    K = _kernel(X, X, ls) + noise * torch.eye(n)
    L = torch.linalg.cholesky(K)
    Ks = _kernel(X, Xq, ls)
    alpha = torch.cholesky_solve((Y - mean_c).unsqueeze(-1), L)
    mu = mean_c + (Ks.T @ alpha).squeeze(-1)
    v = torch.linalg.solve_triangular(L, Ks, upper=False)
    var = (1.0 - (v * v).sum(0)).clamp_min(1e-12)
    sigma = var.sqrt()
    u = (mu - best_f) / sigma
    # log(sigma * (phi(u) + u*Phi(u))) — use logaddexp of the two branches
    log_phi = -0.5 * u * u - 0.5 * math.log(2 * math.pi)
    log_uPhi = torch.where(
        u > 0,
        torch.log(u.clamp_min(1e-300)) + torch.special.log_ndtr(u),
        torch.full_like(u, -np.inf),
    )
    small = torch.logaddexp(log_phi, log_uPhi)
    neg = u <= 0
    # for u <= 0 use log(phi(u) - |u|*Phi(u)) via log1p of the ratio
    ratio = torch.where(
        neg, (-u).clamp_min(0) * torch.exp(torch.special.log_ndtr(u) - log_phi),
        torch.zeros_like(u),
    ).clamp(max=1 - 1e-12)
    out = torch.where(neg, log_phi + torch.log1p(-ratio), small)
    return out + torch.log(sigma)


def optimize_acqf_scipy(X, Y, ls, noise, mean_c, best_f, num_restarts=6,
                        raw_samples=64, maxiter=35, seed=0):
    d = X.shape[1]
    sob = qmc.Sobol(d, scramble=True, seed=seed)
    raws = torch.tensor(sob.random(raw_samples))
    with torch.no_grad():
        vals = log_ei(raws, X, Y, ls, noise, mean_c, best_f)
    # Boltzmann selection (initializers.py:893)
    w = torch.softmax(vals - vals.mean(), 0)
    idx = torch.multinomial(w, num_restarts, replacement=False)
    ics = raws[idx]

    def f_np(v):
        Xq = torch.tensor(v.reshape(num_restarts, d), requires_grad=True)
        val = log_ei(Xq, X, Y, ls, noise, mean_c, best_f).sum()
        (-val).backward()
        return float(-val.detach()), Xq.grad.neg().numpy().ravel().copy()

    res = minimize(f_np, ics.numpy().ravel(), jac=True, method="L-BFGS-B",
                   bounds=[(0.0, 1.0)] * (num_restarts * d),
                   options={"maxiter": maxiter})
    cands = torch.tensor(res.x.reshape(num_restarts, d))
    with torch.no_grad():
        fin = log_ei(cands, X, Y, ls, noise, mean_c, best_f)
    return cands[int(fin.argmax())].unsqueeze(0)


def run(iters=25, n_init=10, seed=0):
    rng = np.random.default_rng(seed)
    X = torch.tensor(rng.uniform(size=(n_init, 2)))
    Y = branin(X)
    t0 = time.perf_counter()
    for it in range(iters):
        mu, sd = Y.mean(), Y.std(correction=1).clamp_min(1e-8)
        Ys = (Y - mu) / sd
        ls, noise, mean_c = fit_gp_scipy(X, Ys, seed=seed * 100 + it)
        cand = optimize_acqf_scipy(X, Ys, ls, noise, mean_c,
                                   float(Ys.max()), seed=seed * 100 + it)
        X = torch.cat([X, cand])
        Y = torch.cat([Y, branin(cand)])
    dt = time.perf_counter() - t0
    return iters / dt, -float(Y.max()) - BRANIN_OPT


if __name__ == "__main__":
    ips, regret = run()
    print(json.dumps({
        "metric": "reference_cpu_bo_iters_per_s_branin_logei",
        "value": round(ips, 4),
        "unit": "iters/s",
        "final_regret": round(regret, 5),
        "note": "torch+scipy replica of the BoTorch 0.11.3 CPU compute "
                "path at bench.py budgets (gpytorch not installable here)",
    }))
