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

# The MC replicas below borrow the repo's host-side numpy Lacour cell
# decomposition; make the repo importable when run as a script, and pin
# jax to CPU before any botorch_tpu import so this script never touches
# the TPU.
import os  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _is_nd_np(Y: np.ndarray) -> np.ndarray:
    """Boolean non-dominated mask (maximization), plain numpy."""
    n = Y.shape[0]
    dominated = np.zeros(n, bool)
    for i in range(n):
        if dominated[i]:
            continue
        dom = (Y >= Y[i]).all(-1) & (Y > Y[i]).any(-1)
        dominated[i] = dom.any()
    return ~dominated

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


# ---------------------------------------------------------------------------
# Monte-Carlo replicas (round-4): qLogNEI q=4 Hartmann-6 and qLogNEHVI
# BraninCurrin (m=2) / DTLZ2 (m=3) loops, at the SAME budgets as the
# corresponding bench.py configs, so BASELINE.md has a measured CPU number
# beside every BENCH_r0N.json field.
#
# The compute pattern mirrors the reference exactly:
#   * joint posterior sampling over [X_baseline; X_cand] with ONE fixed
#     qMC base-sample matrix per iteration (the SAA contract of
#     `botorch/sampling/base.py` + `get_matheron_path`-free MC samplers);
#     because Cholesky factors are lower-triangular, the baseline block of
#     the joint draw is candidate-independent — the same property the
#     reference's CachedCholesky machinery (`acquisition/cached_cholesky
#     .py:66`) exploits, so the replica is not paying work the reference
#     avoids;
#   * qLogNEI (`acquisition/logei.py:237`): per-sample incumbent = max
#     over the baseline block's noiseless draws, smoothed-max over q,
#     log-mean over samples;
#   * qLogNEHVI (`acquisition/multi_objective/monte_carlo.py:325` +
#     `logei.py`): per-MC-sample Lacour non-dominated cell decompositions
#     of the baseline draws, computed ONCE per greedy pick (the
#     reference's construction-time cache), then smoothed per-cell HVI of
#     the candidate inside scipy L-BFGS-B; sequential-greedy q-batches via
#     X_pending exactly like `optimize_acqf(..., sequential=True)`.
#
# Cell decompositions reuse the repo's host-side numpy Lacour
# implementation (`botorch_tpu/utils/multi_objective.py:227`), which is
# value-parity-tested against the reference's FastNondominatedPartitioning
# — a deterministic geometric subroutine, not a modeling choice.
# ---------------------------------------------------------------------------

HARTMANN6_OPT = 3.32237


def hartmann6(x: torch.Tensor) -> torch.Tensor:
    A = torch.tensor([
        [10.0, 3.0, 17.0, 3.5, 1.7, 8.0],
        [0.05, 10.0, 17.0, 0.1, 8.0, 14.0],
        [3.0, 3.5, 1.7, 10.0, 17.0, 8.0],
        [17.0, 8.0, 0.05, 10.0, 0.1, 14.0],
    ])
    P = 1e-4 * torch.tensor([
        [1312.0, 1696.0, 5569.0, 124.0, 8283.0, 5886.0],
        [2329.0, 4135.0, 8307.0, 3736.0, 1004.0, 9991.0],
        [2348.0, 1451.0, 3522.0, 2883.0, 3047.0, 6650.0],
        [4047.0, 8828.0, 8732.0, 5743.0, 1091.0, 381.0],
    ])
    alpha = torch.tensor([1.0, 1.2, 3.0, 3.2])
    inner = ((x.unsqueeze(-2) - P) ** 2 * A).sum(-1)
    return (alpha * torch.exp(-inner)).sum(-1)  # maximized


def currin(x: torch.Tensor) -> torch.Tensor:
    x0, x1 = x[..., 0], x[..., 1]
    num = 2300 * x0**3 + 1900 * x0**2 + 2092 * x0 + 60
    den = 100 * x0**3 + 500 * x0**2 + 4 * x0 + 20
    fac = 1.0 - torch.exp(-1.0 / (2.0 * x1.clamp_min(1e-12)))
    return -(fac * num / den)  # negated (maximize)


def branin_currin(x: torch.Tensor) -> torch.Tensor:
    return torch.stack([branin(x), currin(x)], -1)


def dtlz2_m3(x: torch.Tensor) -> torch.Tensor:
    """DTLZ2 d=4 m=3, negated (maximize), unit-cube inputs."""
    m = 3
    g = ((x[..., m - 1:] - 0.5) ** 2).sum(-1)
    fs = []
    for i in range(m):
        f = 1.0 + g
        for j in range(m - 1 - i):
            f = f * torch.cos(0.5 * math.pi * x[..., j])
        if i > 0:
            f = f * torch.sin(0.5 * math.pi * x[..., m - 1 - i])
        fs.append(f)
    return -torch.stack(fs, -1)


def _nehvi_cells(f_b: torch.Tensor, ref: np.ndarray, max_cells: int):
    """Per-MC-sample Lacour cells of the baseline draws, padded to a
    common cell count (degenerate zero-volume pad cells)."""
    from botorch_tpu.utils.multi_objective import (
        nondominated_hypercell_bounds_np,
    )

    los, ups = [], []
    for i in range(f_b.shape[0]):
        Y = f_b[i].detach().numpy()
        nd = _is_nd_np(Y)
        Ynd = Y[nd]
        keep = (Ynd > ref).all(-1)
        if keep.any():
            lo, up = nondominated_hypercell_bounds_np(
                Ynd[keep], ref, clip_max=1e10
            )
        else:
            lo = ref[None, :] + 0.0
            up = lo + 0.0  # zero-volume: HVI = full box above ref
            up = np.broadcast_to(ref[None, :] + 1e10, lo.shape).copy()
        los.append(torch.tensor(lo))
        ups.append(torch.tensor(up))
    C = max(max(t.shape[0] for t in los), 1)
    lo_pad = torch.zeros(f_b.shape[0], C, f_b.shape[-1], dtype=torch.float64)
    up_pad = torch.zeros_like(lo_pad)
    for i, (lo, up) in enumerate(zip(los, ups)):
        lo_pad[i, : lo.shape[0]] = lo
        up_pad[i, : up.shape[0]] = up
        lo_pad[i, lo.shape[0]:] = 0.0
        up_pad[i, lo.shape[0]:] = 0.0  # zero-volume pad
    return lo_pad, up_pad


class _JointMOSampler:
    """Per-output exact-GP joint posterior sampler with fixed base
    samples. Baseline-block draws are candidate-independent (lower-
    triangular Cholesky), matching the reference's cached-Cholesky SAA."""

    def __init__(self, X, Ys, hypers, z):
        # X (n, d); Ys (n, m) standardized; z (n_mc, n_tot, m) fixed
        self.X, self.hypers, self.z = X, hypers, z
        self.n = X.shape[0]
        self.Ls, self.alphas = [], []
        for j, (ls, noise, mean_c) in enumerate(hypers):
            K = _kernel(X, X, ls) + noise * torch.eye(self.n)
            L = torch.linalg.cholesky(K)
            self.Ls.append(L)
            self.alphas.append(
                torch.cholesky_solve((Ys[:, j] - mean_c).unsqueeze(-1), L)
            )

    def joint_samples(self, X_ext):
        """Noiseless joint draws over X_ext rows: (n_mc, n_ext, m), or
        batched over a leading restart dim (R, n_mc, n_ext, m) — the
        reference's t-batch evaluation of all restarts in one tensor op
        (`optimize_acqf` batch_initial_conditions). X_ext must have the
        training X as a prefix."""
        n_ext = X_ext.shape[-2]
        Xtr = self.X
        if X_ext.dim() == 3:
            Xtr = self.X.unsqueeze(0).expand(X_ext.shape[0], -1, -1)
        outs = []
        for j, (ls, noise, mean_c) in enumerate(self.hypers):
            Ks = _kernel(Xtr, X_ext, ls)  # (..., n, n_ext)
            mu = mean_c + (Ks.mT @ self.alphas[j]).squeeze(-1)
            v = torch.linalg.solve_triangular(self.Ls[j], Ks, upper=False)
            Kxx = _kernel(X_ext, X_ext, ls)
            C = Kxx - v.mT @ v + 1e-8 * torch.eye(n_ext)
            Lp = torch.linalg.cholesky(C)
            zj = self.z[:, :n_ext, j]
            outs.append(mu.unsqueeze(-2) + zj @ Lp.mT)
        return torch.stack(outs, -1)


def _smooth_hvi_q1(y, lo, up, tau=1e-3):
    """Smoothed HVI of ONE candidate per MC sample: y (n_mc, m),
    cells (n_mc, C, m). Soft-plus edge smoothing (logei.py fatplus)."""
    edge = torch.minimum(y.unsqueeze(1), up) - lo
    edge = tau * torch.nn.functional.softplus(edge / tau)
    return (edge.prod(-1)).sum(-1)  # (n_mc,)


def optimize_qnehvi_scipy(sampler, cells, d, ref_t, num_restarts, raw_samples,
                          maxiter, seed, X_ext):
    """One sequential-greedy pick: scipy L-BFGS-B over flattened restarts."""
    sob = qmc.Sobol(d, scramble=True, seed=seed)
    raws = torch.tensor(sob.random(raw_samples))
    lo, up = cells

    def acq(Xq):  # Xq (R, d) -> (R,)
        R = Xq.shape[0]
        Xa = torch.cat(
            [X_ext.unsqueeze(0).expand(R, -1, -1), Xq.unsqueeze(1)], dim=1
        )
        f = sampler.joint_samples(Xa)  # (R, n_mc, n_ext+1, m)
        y = f[:, :, -1, :]  # (R, n_mc, m)
        edge = torch.minimum(y.unsqueeze(2), up) - lo  # (R, n_mc, C, m)
        edge = 1e-3 * torch.nn.functional.softplus(edge / 1e-3)
        hvi = edge.prod(-1).sum(-1)  # (R, n_mc)
        return torch.log(hvi.mean(-1) + 1e-30)

    with torch.no_grad():
        vals = acq(raws)
    w = torch.softmax(vals - vals.mean(), 0)
    idx = torch.multinomial(w, num_restarts, replacement=False)
    ics = raws[idx]

    def f_np(v):
        Xq = torch.tensor(v.reshape(num_restarts, d), requires_grad=True)
        val = acq(Xq).sum()
        (-val).backward()
        return float(-val.detach()), Xq.grad.neg().numpy().ravel().copy()

    res = minimize(f_np, ics.numpy().ravel(), jac=True, method="L-BFGS-B",
                   bounds=[(0.0, 1.0)] * (num_restarts * d),
                   options={"maxiter": maxiter})
    cands = torch.tensor(res.x.reshape(num_restarts, d))
    with torch.no_grad():
        fin = acq(cands)
    return cands[int(fin.argmax())].unsqueeze(0)


def run_qnehvi(objective, d, m, ref_point, iters, q, n_init=10, n_mc=32,
               num_restarts=4, raw_samples=32, fit_maxiter=35,
               acq_maxiter=15, seed=0):
    """Host-driven sequential-greedy qLogNEHVI loop (the reference's
    qNEHVI tutorial pattern). Returns (iters_per_s, observed_hv)."""
    from botorch_tpu.utils.multi_objective import dominated_hypervolume_np

    rng = np.random.default_rng(seed)
    X = torch.tensor(rng.uniform(size=(n_init, d)))
    Y = objective(X)
    ref = np.asarray(ref_point, np.float64)
    ref_t = torch.tensor(ref)
    t0 = time.perf_counter()
    for it in range(iters):
        mu, sd = Y.mean(0), Y.std(0, correction=1).clamp_min(1e-8)
        Ys = (Y - mu) / sd
        hypers = [
            fit_gp_scipy(X, Ys[:, j], maxiter=fit_maxiter, restarts=2,
                         seed=seed * 1000 + it * 10 + j)
            for j in range(m)
        ]
        n = X.shape[0]
        g = torch.Generator().manual_seed(seed * 777 + it)
        z = torch.randn(n_mc, n + q, m, generator=g, dtype=torch.float64)
        sampler = _JointMOSampler(X, Ys, hypers, z)
        ref_s = (ref_t - mu.numpy()) / sd.numpy()
        picks = []
        X_ext = X
        for j in range(q):
            with torch.no_grad():
                f_b = sampler.joint_samples(X_ext)
            cells = _nehvi_cells(f_b, np.asarray(ref_s), max_cells=512)
            cand = optimize_qnehvi_scipy(
                sampler, cells, d, ref_s, num_restarts, raw_samples,
                acq_maxiter, seed * 999 + it * 10 + j, X_ext,
            )
            picks.append(cand)
            X_ext = torch.cat([X_ext, cand])
        cand = torch.cat(picks)
        X = torch.cat([X, cand])
        Y = torch.cat([Y, objective(cand)])
    dt = time.perf_counter() - t0
    Yn = Y.numpy()
    nd = _is_nd_np(Yn)
    keep = (Yn[nd] > ref).all(-1)
    hv = dominated_hypervolume_np(Yn[nd][keep], ref) if keep.any() else 0.0
    return iters / dt, hv


def log_qnei(Xq_b, sampler, best, tau_max=1e-2, tau_relu=1e-6):
    """qLogNEI over a batch of q-batches: Xq_b (R, q, d), incumbent `best`
    (n_mc,) from the X-independent baseline block. logei.py:237 pattern."""
    R, q, d = Xq_b.shape
    Xa = torch.cat(
        [sampler.X.unsqueeze(0).expand(R, -1, -1), Xq_b], dim=1
    )
    f = sampler.joint_samples(Xa)[:, :, -q:, 0]  # (R, n_mc, q)
    imp = f - best.unsqueeze(-1)
    imp_s = tau_relu * torch.nn.functional.softplus(imp / tau_relu)
    log_imp = torch.log(imp_s + 1e-300)
    qmax = tau_max * torch.logsumexp(log_imp / tau_max, dim=-1)  # (R, n_mc)
    return torch.logsumexp(qmax, -1) - math.log(f.shape[1])


def run_qnei(iters=15, n_init=16, q=4, n_mc=128, num_restarts=6,
             raw_samples=64, fit_maxiter=35, acq_maxiter=15, seed=0):
    """Host-driven qLogNEI q=4 loop on Hartmann-6 (joint q-batch ascent,
    bench.py config-2 budgets). Returns (iters_per_s, final_regret)."""
    d = 6
    rng = np.random.default_rng(seed)
    X = torch.tensor(rng.uniform(size=(n_init, d)))
    Y = hartmann6(X)
    t0 = time.perf_counter()
    for it in range(iters):
        mu, sd = Y.mean(), Y.std(correction=1).clamp_min(1e-8)
        Ys = (Y - mu) / sd
        hypers = [fit_gp_scipy(X, Ys, maxiter=fit_maxiter, restarts=2,
                               seed=seed * 1000 + it)]
        n = X.shape[0]
        g = torch.Generator().manual_seed(seed * 777 + it)
        z = torch.randn(n_mc, n + q, 1, generator=g, dtype=torch.float64)
        sampler = _JointMOSampler(X, Ys.unsqueeze(-1), hypers, z)
        with torch.no_grad():
            best = sampler.joint_samples(X)[:, :, 0].max(-1).values
        sob = qmc.Sobol(q * d, scramble=True, seed=seed * 999 + it)
        raws = torch.tensor(sob.random(raw_samples)).reshape(raw_samples, q, d)
        with torch.no_grad():
            vals = log_qnei(raws, sampler, best)
        w = torch.softmax(vals - vals.mean(), 0)
        idx = torch.multinomial(w, num_restarts, replacement=False)
        ics = raws[idx]

        def f_np(v):
            Xq = torch.tensor(v.reshape(num_restarts, q, d),
                              requires_grad=True)
            val = log_qnei(Xq, sampler, best).sum()
            (-val).backward()
            return float(-val.detach()), Xq.grad.neg().numpy().ravel().copy()

        res = minimize(f_np, ics.numpy().ravel(), jac=True, method="L-BFGS-B",
                       bounds=[(0.0, 1.0)] * (num_restarts * q * d),
                       options={"maxiter": acq_maxiter})
        cands = torch.tensor(res.x.reshape(num_restarts, q, d))
        with torch.no_grad():
            fin = log_qnei(cands, sampler, best)
        cand = cands[int(fin.argmax())]
        X = torch.cat([X, cand])
        Y = torch.cat([Y, hartmann6(cand)])
    dt = time.perf_counter() - t0
    return iters / dt, HARTMANN6_OPT - float(Y.max())


# ---------------------------------------------------------------------------
# SAASBO replica (round-5): the reference's `fit_fully_bayesian_model_nuts`
# (`botorch/fit.py:335-391`) runs ONE sequential pyro NUTS chain over the
# SAAS posterior (`models/fully_bayesian.py:148-247` priors) and optimizes
# an ensemble-reduced analytic acquisition. gpytorch/pyro are not
# installable here, so this hand-rolls the SAME compute pattern:
#   * SAAS potential in torch (Matern-5/2, HalfCauchy(0.1) global tau^2 x
#     HalfCauchy(1) per-dim inverse-square lengthscales, Gamma(2,0.15)
#     outputscale, MIN+Gamma(0.9,10) noise, N(0,1) mean — the exact
#     constants of the reference), gradients via torch autograd;
#   * single-chain NUTS (Hoffman-Gelman Alg. 6: slice variable, tree
#     doubling to depth 6, dual-averaging step size to 0.8 accept, one
#     diagonal mass re-estimation mid-warmup — the Stan/pyro warmup
#     scheme at pyro's defaults);
#   * thinned draws -> 16-model ensemble; analytic LogEI per model
#     reduced with logmeanexp (`acquisition/logei.py` fully-Bayesian
#     reduction), optimized by multi-start scipy L-BFGS-B.
# Budgets mirror bench.py's saasbo config (warmup 256 / samples 128 /
# thin 8 -> 16 kept models; the kept-ensemble size equals the TPU side's,
# which runs 8 parallel chains because chains are free there).
# ---------------------------------------------------------------------------

SAAS_MIN_NOISE = 1e-4


def _matern52_t(X1, X2, ls):
    r = torch.cdist(X1 / ls, X2 / ls).clamp_min(1e-12)
    s5r = math.sqrt(5.0) * r
    return (1.0 + s5r + s5r * s5r / 3.0) * torch.exp(-s5r)


def _saas_unpack(z, d):
    mean = z[0]
    outputscale = torch.exp(z[1])
    noise_g = torch.exp(z[2])
    tausq = torch.exp(z[3])
    ilsq = torch.exp(z[4 : 4 + d])
    ls = torch.rsqrt(tausq * ilsq)
    return mean, outputscale, SAAS_MIN_NOISE + noise_g, noise_g, tausq, ilsq, ls


def _saas_potential(z, X, Ys):
    """Negative log joint of the SAAS model over unconstrained z
    (constants: reference `fully_bayesian.py:168-247`)."""
    d = X.shape[1]
    mean, outputscale, noise, noise_g, tausq, ilsq, ls = _saas_unpack(z, d)
    n = X.shape[0]
    K = outputscale * _matern52_t(X, X, ls) + noise * torch.eye(n)
    K = K + 1e-6 * K.diagonal().abs().mean() * torch.eye(n)
    L = torch.linalg.cholesky(K)
    resid = (Ys - mean).unsqueeze(-1)
    alpha = torch.cholesky_solve(resid, L)
    loglik = (
        -0.5 * ((resid * alpha).sum() + n * math.log(2 * math.pi))
        - torch.log(L.diagonal()).sum()
    )
    lp = -0.5 * mean * mean - 0.5 * math.log(2 * math.pi)
    lp = lp + (2.0 * math.log(0.15) - math.lgamma(2.0)
               + torch.log(outputscale) - 0.15 * outputscale)
    lp = lp + (0.9 * math.log(10.0) - math.lgamma(0.9)
               - 0.1 * torch.log(noise_g) - 10.0 * noise_g)
    lp = lp + (math.log(2.0 / math.pi) - math.log(0.1)
               - torch.log1p((tausq / 0.1) ** 2))
    lp = lp + (math.log(2.0 / math.pi) - torch.log1p(ilsq**2)).sum()
    log_jac = z[1:].sum()
    return -(loglik + lp + log_jac)


def _saas_pot_grad(z_np, X, Ys):
    # The reference registers pyro exception handlers so LinAlgError /
    # non-PSD during leapfrog counts as a rejected proposal instead of a
    # crash (`models/fully_bayesian.py:67-78`); +inf energy does the same
    # for this hand-rolled chain.
    try:
        z = torch.tensor(z_np, requires_grad=True)
        u = _saas_potential(z, X, Ys)
        u.backward()
        uf = float(u.detach())
        g = z.grad.numpy().copy()
        if not (math.isfinite(uf) and np.all(np.isfinite(g))):
            raise FloatingPointError
        return uf, g
    except (torch.linalg.LinAlgError, FloatingPointError, RuntimeError):
        return float("inf"), np.zeros_like(z_np)


def _nuts_chain(X, Ys, z0, num_warmup, num_samples, max_depth=6, seed=0,
                target_accept=0.8):
    """Single sequential NUTS chain (Hoffman-Gelman 2014 Alg. 6) with
    dual-averaging step size and one mid-warmup diagonal mass update —
    the reference's pyro `NUTS(..., max_tree_depth=6)` pattern."""
    rng = np.random.default_rng(seed)
    d = z0.shape[0]
    inv_mass = np.ones(d)

    def pot_grad(z):
        return _saas_pot_grad(z, X, Ys)

    def leapfrog(z, p, eps):
        _, g = pot_grad(z)
        p = p - 0.5 * eps * g
        z = z + eps * inv_mass * p
        u, g = pot_grad(z)
        p = p - 0.5 * eps * g
        return z, p, u

    def energy(u, p):
        return u + 0.5 * np.sum(inv_mass * p * p)

    # reasonable initial step size (HG Alg. 4, cheap version)
    eps = 0.1
    u0, _ = pot_grad(z0)
    p0 = rng.normal(size=d) / np.sqrt(inv_mass)
    z1, p1, u1 = leapfrog(z0.copy(), p0.copy(), eps)
    dE = energy(u0, p0) - energy(u1, p1)
    k = 1.0 if dE > math.log(0.5) else -1.0
    for _ in range(30):
        eps = eps * (2.0**k)
        z1, p1, u1 = leapfrog(z0.copy(), p0.copy(), eps)
        dE = energy(u0, p0) - energy(u1, p1)
        if (k == 1.0 and dE <= math.log(0.5)) or (
            k == -1.0 and dE >= math.log(0.5)
        ):
            break

    mu = math.log(10.0 * eps)
    log_eps_bar, H_bar = 0.0, 0.0
    gamma, t0, kappa = 0.05, 10.0, 0.75
    z = z0.copy()
    draws = []
    warm_buf = []
    n_alpha = [0.0, 0.0]  # sum alpha, n

    def build_tree(z, p, log_u, v, j, eps, E0):
        if j == 0:
            z1, p1, u1 = leapfrog(z.copy(), p.copy(), v * eps)
            E1 = energy(u1, p1)
            n1 = 1 if log_u <= -E1 + E0 else 0
            s1 = log_u < 1000.0 - E1 + E0
            a = min(1.0, math.exp(min(E0 - E1, 0.0)))
            return z1, p1, z1, p1, z1, n1, s1, a, 1
        zm, pm, zp, pp, z1, n1, s1, a1, na1 = build_tree(
            z, p, log_u, v, j - 1, eps, E0
        )
        if s1:
            if v == -1:
                zm, pm, _, _, z2, n2, s2, a2, na2 = build_tree(
                    zm, pm, log_u, v, j - 1, eps, E0
                )
            else:
                _, _, zp, pp, z2, n2, s2, a2, na2 = build_tree(
                    zp, pp, log_u, v, j - 1, eps, E0
                )
            if n1 + n2 > 0 and rng.uniform() < n2 / (n1 + n2):
                z1 = z2
            a1 += a2
            na1 += na2
            dz = zp - zm
            s1 = (
                s2
                and (np.dot(dz, inv_mass * pm) >= 0)
                and (np.dot(dz, inv_mass * pp) >= 0)
            )
            n1 += n2
        return zm, pm, zp, pp, z1, n1, s1, a1, na1

    total = num_warmup + num_samples
    for it in range(total):
        p = rng.normal(size=d) / np.sqrt(inv_mass)
        u_z, _ = pot_grad(z)
        E0 = energy(u_z, p)
        log_u = math.log(max(rng.uniform(), 1e-300))  # slice: u ~ U(0, e^-E0)
        zm, pm, zp, pp = z.copy(), p.copy(), z.copy(), p.copy()
        j, n_keep, s = 0, 1, True
        z_next = z.copy()
        a_sum, na_sum = 0.0, 1
        while s and j < max_depth:
            v = 1 if rng.uniform() < 0.5 else -1
            if v == -1:
                zm, pm, _, _, z1, n1, s1, a, na = build_tree(
                    zm, pm, log_u, v, j, eps, E0
                )
            else:
                _, _, zp, pp, z1, n1, s1, a, na = build_tree(
                    zp, pp, log_u, v, j, eps, E0
                )
            if s1 and n1 > 0 and rng.uniform() < min(1.0, n1 / n_keep):
                z_next = z1
            n_keep += n1
            dz = zp - zm
            s = (
                s1
                and (np.dot(dz, inv_mass * pm) >= 0)
                and (np.dot(dz, inv_mass * pp) >= 0)
            )
            a_sum, na_sum = a_sum + a, na
            j += 1
        z = z_next
        if it < num_warmup:
            # dual averaging
            m = it + 1
            H_bar = (1 - 1 / (m + t0)) * H_bar + (
                target_accept - a_sum / max(na_sum, 1)
            ) / (m + t0)
            log_eps = mu - math.sqrt(m) / gamma * H_bar
            w = m**-kappa
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
            eps = math.exp(log_eps)
            warm_buf.append(z.copy())
            if it == num_warmup // 2:
                # one diagonal mass window (Stan's windowed adaptation,
                # collapsed to a single window at this budget)
                seg = np.asarray(warm_buf[num_warmup // 4 :])
                if seg.shape[0] >= 8:
                    var = seg.var(0) + 1e-3
                    inv_mass = var
                # re-open step-size adaptation around the new metric
                mu = math.log(10.0 * eps)
                H_bar, log_eps_bar = 0.0, 0.0
        else:
            if it == num_warmup:
                eps = math.exp(log_eps_bar)
            draws.append(z.copy())
    return np.asarray(draws)


def _saas_log_ei_ensemble(Xq, X, Ys, models, best_f):
    """log( mean_models EI ) via logmeanexp of per-model analytic LogEI —
    the reference's fully-Bayesian acquisition reduction
    (`acquisition/logei.py` + `utils/transforms.py:292-296`)."""
    outs = []
    n = X.shape[0]
    for mean_c, outputscale, noise, ls in models:
        K = outputscale * _matern52_t(X, X, ls) + noise * torch.eye(n)
        L = torch.linalg.cholesky(K)
        Ks = outputscale * _matern52_t(X, Xq, ls)
        alpha = torch.cholesky_solve((Ys - mean_c).unsqueeze(-1), L)
        mu = mean_c + (Ks.mT @ alpha).squeeze(-1)
        v = torch.linalg.solve_triangular(L, Ks, upper=False)
        var = (outputscale - (v * v).sum(0)).clamp_min(1e-12)
        sigma = var.sqrt()
        u = (mu - best_f) / sigma
        log_phi = -0.5 * u * u - 0.5 * math.log(2 * math.pi)
        log_uPhi = torch.where(
            u > 0,
            torch.log(u.clamp_min(1e-300)) + torch.special.log_ndtr(u),
            torch.full_like(u, -np.inf),
        )
        small = torch.logaddexp(log_phi, log_uPhi)
        neg = u <= 0
        ratio = torch.where(
            neg,
            (-u).clamp_min(0)
            * torch.exp(torch.special.log_ndtr(u) - log_phi),
            torch.zeros_like(u),
        ).clamp(max=1 - 1e-12)
        out = torch.where(neg, log_phi + torch.log1p(-ratio), small)
        outs.append(out + torch.log(sigma))
    stack = torch.stack(outs)  # (S, nq)
    return torch.logsumexp(stack, 0) - math.log(stack.shape[0])


def run_saasbo_replica(iters=16, n_init=10, d=8, num_warmup=256,
                       num_samples=128, thin=8, num_restarts=32,
                       raw_samples=512, acq_maxiter=50, seed=0):
    """Branin embedded in d=8 (dims 0,1 active), unit-cube inputs —
    the same problem/budgets as bench.py's saasbo config. Returns
    (iters_per_s, final_regret, transitions_per_s)."""
    rng = np.random.default_rng(seed)
    X = torch.tensor(rng.uniform(size=(n_init, d)))
    Y = branin(X[:, :2])
    t0 = time.perf_counter()
    n_trans = 0
    for it in range(iters):
        mu_y, sd_y = Y.mean(), Y.std(correction=1).clamp_min(1e-8)
        Ys = (Y - mu_y) / sd_y
        z0 = np.concatenate(
            [[0.0, 0.0, math.log(0.01), math.log(0.1)], np.zeros(d)]
        ) + 0.5 * rng.normal(size=4 + d)
        draws = _nuts_chain(
            X, Ys, z0, num_warmup, num_samples,
            seed=seed * 1000 + it,
        )
        n_trans += num_warmup + num_samples
        kept = draws[::thin]
        models = []
        for z in kept:
            mean_c, outputscale, noise, _, _, _, ls = _saas_unpack(
                torch.tensor(z), d
            )
            models.append((mean_c, outputscale, noise, ls))
        best_f = float(Ys.max())
        sob = qmc.Sobol(d, scramble=True, seed=seed * 999 + it)
        raws = torch.tensor(sob.random(raw_samples))
        with torch.no_grad():
            vals = _saas_log_ei_ensemble(raws, X, Ys, models, best_f)
        w = torch.softmax(vals - vals.mean(), 0)
        idx = torch.multinomial(w, num_restarts, replacement=False)
        ics = raws[idx]

        def f_np(v):
            Xq = torch.tensor(v.reshape(num_restarts, d), requires_grad=True)
            val = _saas_log_ei_ensemble(Xq, X, Ys, models, best_f).sum()
            (-val).backward()
            return float(-val.detach()), Xq.grad.neg().numpy().ravel().copy()

        res = minimize(f_np, ics.numpy().ravel(), jac=True, method="L-BFGS-B",
                       bounds=[(0.0, 1.0)] * (num_restarts * d),
                       options={"maxiter": acq_maxiter})
        cands = torch.tensor(res.x.reshape(num_restarts, d))
        with torch.no_grad():
            fin = _saas_log_ei_ensemble(cands, X, Ys, models, best_f)
        cand = cands[int(fin.argmax())].unsqueeze(0)
        X = torch.cat([X, cand])
        Y = torch.cat([Y, branin(cand[:, :2])])
    dt = time.perf_counter() - t0
    return iters / dt, -float(Y.max()) - BRANIN_OPT, n_trans / dt


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="logei",
                   choices=["logei", "qnei", "qnehvi2", "qnehvi3", "saasbo",
                            "all"])
    p.add_argument("--seeds", type=int, default=1)
    args = p.parse_args()

    def emit(metric, ips, quality, qname, extra=None):
        rec = {
            "metric": metric, "value": round(ips, 4), "unit": "iters/s",
            qname: round(quality, 5),
            "note": "torch+scipy replica of the BoTorch 0.11.3 CPU compute "
                    "path at bench.py budgets (gpytorch not installable "
                    "here)",
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    if args.config in ("logei", "all"):
        ips, regret = run()
        emit("reference_cpu_bo_iters_per_s_branin_logei", ips, regret,
             "final_regret")
    if args.config in ("qnei", "all"):
        rs = [run_qnei(seed=s) for s in range(args.seeds)]
        emit("reference_cpu_qnei_q4_hartmann6_iters_per_s",
             float(np.mean([r[0] for r in rs])),
             float(np.mean([r[1] for r in rs])), "final_regret",
             {"seeds": args.seeds,
              "regrets": [round(r[1], 4) for r in rs]})
    if args.config in ("qnehvi2", "all"):
        max_hv = 59.36011874867746
        rs = [run_qnehvi(branin_currin, d=2, m=2,
                         ref_point=[-18.0, -6.0], iters=20, q=4, seed=s)
              for s in range(args.seeds)]
        emit("reference_cpu_qnehvi_bc_iters_per_s",
             float(np.mean([r[0] for r in rs])),
             float(np.mean([r[1] / max_hv for r in rs])), "hv_frac_of_max",
             {"seeds": args.seeds,
              "hv_fracs": [round(r[1] / max_hv, 4) for r in rs]})
    if args.config in ("saasbo", "all"):
        rs = [run_saasbo_replica(seed=s) for s in range(args.seeds)]
        emit("reference_cpu_saasbo_iters_per_s",
             float(np.mean([r[0] for r in rs])),
             float(np.mean([r[1] for r in rs])), "final_regret",
             {"seeds": args.seeds,
              "regrets": [round(r[1], 4) for r in rs],
              "transitions_per_s": round(
                  float(np.mean([r[2] for r in rs])), 2)})
    if args.config in ("qnehvi3", "all"):
        max_hv = 1.1**3 - math.pi / 6.0
        rs = [run_qnehvi(dtlz2_m3, d=4, m=3,
                         ref_point=[-1.1, -1.1, -1.1], iters=15, q=2,
                         seed=s)
              for s in range(args.seeds)]
        emit("reference_cpu_qnehvi_dtlz2_m3_iters_per_s",
             float(np.mean([r[0] for r in rs])),
             float(np.mean([r[1] / max_hv for r in rs])), "hv_frac_of_max",
             {"seeds": args.seeds,
              "hv_fracs": [round(r[1] / max_hv, 4) for r in rs]})


if __name__ == "__main__":
    main()
