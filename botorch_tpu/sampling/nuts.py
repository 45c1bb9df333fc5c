r"""Native vectorized No-U-Turn Sampler (NUTS) for TPU.

Replaces the reference's Pyro NUTS dependency
(`botorch/fit.py:335-391`: `pyro.infer.mcmc.NUTS`, `full_mass=True`,
`max_tree_depth=6`, single sequential chain). The TPU-native design runs
MANY chains in lockstep — each chain is a vmapped lane, shardable over a
device mesh — with:

  * iterative (recursion-free) multinomial tree building with fixed-depth
    checkpoint stacks, following the published iterative-NUTS construction
    [Phan2019numpyro; Hoffman2014nuts]: all shapes are static, the only
    dynamic control flow is `lax.while_loop` over doublings/leaves;
  * dense ("full") mass-matrix adaptation via Stan-style expanding warmup
    windows (init buffer 75, doubling windows from 25, term buffer 50),
    matching the reference's `full_mass=True`;
  * dual-averaging step-size adaptation (target accept 0.8) reset at each
    window boundary;
  * divergence handling: a leapfrog step with energy error > 1000 ends the
    trajectory and the sample is rejected — the analogue of the reference's
    LinAlgError->rejected-proposal handlers (`fully_bayesian.py:67-78`).

The potential function must be a pure JAX `U(z) -> scalar` over an
unconstrained flat vector (use `models/fully_bayesian.py` here for the
SAAS reparameterization).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_DELTA_ENERGY = 1000.0  # divergence threshold


# --------------------------------------------------------------------------- #
# Mass matrix helpers (dense). `chol_cov` is chol(Sigma) where Sigma ~ cov(z)
# is the INVERSE mass matrix; momenta are N(0, Sigma^-1).
# --------------------------------------------------------------------------- #
def _draw_momentum(key: Array, chol_cov: Array) -> Array:
    eps = jax.random.normal(key, (chol_cov.shape[-1],))
    # r ~ N(0, Sigma^-1)  via  r = L^-T eps
    return jax.scipy.linalg.solve_triangular(chol_cov.T, eps, lower=False)


def _velocity(r: Array, chol_cov: Array) -> Array:
    """v = M^-1 r = Sigma r = L (L^T r)."""
    return chol_cov @ (chol_cov.T @ r)


def _kinetic(r: Array, chol_cov: Array) -> Array:
    w = chol_cov.T @ r
    return 0.5 * jnp.dot(w, w)


# --------------------------------------------------------------------------- #
class _TreeState(NamedTuple):
    # trajectory edges
    z_left: Array
    r_left: Array
    g_left: Array
    z_right: Array
    r_right: Array
    g_right: Array
    # proposal (multinomial)
    z_prop: Array
    pe_prop: Array
    g_prop: Array
    # bookkeeping
    r_sum: Array  # momentum sum over the whole tree
    log_sum_w: Array  # log sum of leaf weights
    depth: Array
    turning: Array
    diverging: Array
    sum_accept: Array  # sum of per-leaf accept probabilities
    num_leaves: Array


def _is_turning(r_sum: Array, r_first: Array, r_last: Array, chol_cov: Array) -> Array:
    v_first = _velocity(r_first, chol_cov)
    v_last = _velocity(r_last, chol_cov)
    return (jnp.dot(r_sum, v_first) <= 0) | (jnp.dot(r_sum, v_last) <= 0)


@partial(jax.jit, static_argnums=(0, 6))
def nuts_transition(
    potential_and_grad: Callable,
    z: Array,
    pe: Array,
    g: Array,
    key: Array,
    adapt: tuple[Array, Array],  # (step_size, chol_cov)
    max_depth: int = 6,
):
    """One NUTS update for a single chain (vmap over chains outside).

    Returns `(z_new, pe_new, g_new, stats)` where `stats` carries the mean
    accept probability, divergence flag, and tree depth.
    """
    step_size, chol_cov = adapt
    k = z.shape[0]
    key_mom, key_dirs, key_prop = jax.random.split(key, 3)

    r0 = _draw_momentum(key_mom, chol_cov)
    energy0 = pe + _kinetic(r0, chol_cov)

    def leapfrog(z, r, g, eps):
        r_half = r - 0.5 * eps * g
        z_new = z + eps * _velocity(r_half, chol_cov)
        pe_new, g_new = potential_and_grad(z_new)
        r_new = r_half - 0.5 * eps * g_new
        return z_new, r_new, pe_new, g_new

    # ---------------------------------------------------------------- #
    def build_subtree(carry_key, edge, direction, depth):
        """Build a subtree of `2**depth` leaves from `edge` in `direction`.

        Iterative with checkpoint stacks: even leaves store (r, r_sum)
        at slot popcount(n); odd leaves check U-turns against checkpoint
        slots [idx_max - trailing_ones(n) + 1, idx_max], idx_max =
        popcount(n) - 1.
        """
        z0, r0_, g0 = edge
        num = 2 ** depth
        eps = direction * step_size

        r_ckpts = jnp.zeros((max_depth + 1, k))
        rsum_ckpts = jnp.zeros((max_depth + 1, k))

        def leaf_body(state):
            (n, z_c, r_c, pe_c, g_c, r_sum, lsw, prop, sum_acc, stop, div,
             r_ck, rs_ck, z_first, r_first, g_first, pkey) = state
            z_n, r_n, pe_n, g_n = leapfrog(z_c, r_c, g_c, eps)
            delta = energy0 - (pe_n + _kinetic(r_n, chol_cov))
            div_n = (~jnp.isfinite(delta)) | (delta < -MAX_DELTA_ENERGY)
            lw = jnp.where(div_n, -jnp.inf, delta)  # log leaf weight
            accept = jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0)))

            # progressive multinomial within the subtree
            lsw_new = jnp.logaddexp(lsw, lw)
            pkey, sub = jax.random.split(pkey)
            take = jnp.log(jax.random.uniform(sub, (), minval=1e-38)) < (lw - lsw_new)
            z_p, pe_p, g_p = prop
            prop_new = (
                jnp.where(take, z_n, z_p),
                jnp.where(take, pe_n, pe_p),
                jnp.where(take, g_n, g_p),
            )

            r_sum_new = r_sum + r_n

            is_even = (n % 2) == 0
            pc = jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)
            # store checkpoints at even leaves (slot = popcount(n)); the
            # stored r_sum is EXCLUSIVE of the current leaf.
            slot = jnp.clip(pc, 0, max_depth)
            r_ck = jnp.where(is_even, r_ck.at[slot].set(r_n), r_ck)
            rs_ck = jnp.where(is_even, rs_ck.at[slot].set(r_sum), rs_ck)

            # U-turn checks at odd leaves against the active checkpoints.
            # trailing_ones(n) = popcount(n & ~(n+1)) — the low 1-run.
            n_u = n.astype(jnp.uint32)
            trailing_ones = jax.lax.population_count(
                n_u & ~(n_u + 1)
            ).astype(jnp.int32)
            idx_max = pc - 1
            idx_min = idx_max - trailing_ones + 1

            def check_turn(i, turned):
                active = (i >= idx_min) & (i <= idx_max) & (~is_even)
                sub_sum = r_sum_new - rs_ck[i]
                t = _is_turning(sub_sum, r_ck[i], r_n, chol_cov)
                return turned | (active & t)

            turned = jax.lax.fori_loop(0, max_depth + 1, check_turn, jnp.bool_(False))

            stop_new = div_n | turned
            # first leaf of the subtree is its inner edge
            z_first = jnp.where(n == 0, z_n, z_first)
            r_first = jnp.where(n == 0, r_n, r_first)
            g_first = jnp.where(n == 0, g_n, g_first)
            return (n + 1, z_n, r_n, pe_n, g_n, r_sum_new, lsw_new, prop_new,
                    sum_acc + accept, stop | stop_new, div | div_n,
                    r_ck, rs_ck, z_first, r_first, g_first, pkey)

        def leaf_cond(state):
            n = state[0]
            stop = state[9]
            return (n < num) & (~stop)

        init = (
            jnp.int32(0), z0, r0_, jnp.asarray(0.0), g0,
            jnp.zeros((k,)), -jnp.inf,
            (z0, jnp.asarray(jnp.inf), g0),
            jnp.asarray(0.0), jnp.bool_(False), jnp.bool_(False),
            r_ckpts, rsum_ckpts, z0, r0_, g0, carry_key,
        )
        out = jax.lax.while_loop(leaf_cond, leaf_body, init)
        (n_done, z_last, r_last, pe_last, g_last, r_sum, lsw, prop, sum_acc,
         stop, div, _, _, z_first, r_first, g_first, pkey) = out
        turned = stop & (~div)
        return (
            dict(
                z_first=z_first, r_first=r_first, g_first=g_first,
                z_last=z_last, r_last=r_last, g_last=g_last,
                pe_last=pe_last,
                r_sum=r_sum, log_sum_w=lsw, prop=prop,
                sum_accept=sum_acc, num_leaves=n_done.astype(jnp.float32),
                turning=turned, diverging=div,
            ),
            pkey,
        )

    # ---------------------------------------------------------------- #
    pe0_grad = g
    init_tree = _TreeState(
        z_left=z, r_left=r0, g_left=pe0_grad,
        z_right=z, r_right=r0, g_right=pe0_grad,
        z_prop=z, pe_prop=pe, g_prop=pe0_grad,
        r_sum=r0, log_sum_w=jnp.asarray(0.0),
        depth=jnp.int32(0), turning=jnp.bool_(False),
        diverging=jnp.bool_(False), sum_accept=jnp.asarray(0.0),
        num_leaves=jnp.asarray(0.0),
    )
    dirs = jax.random.rademacher(key_dirs, (max_depth,), dtype=jnp.int32)

    def double_cond(carry):
        tree, _ = carry
        return (tree.depth < max_depth) & (~tree.turning) & (~tree.diverging)

    # The subtree size 2**depth is dynamic in the doubling loop, so the
    # doubling body is expressed as lax.switch over static depths.
    def make_double(depth_static):
        def fn(carry):
            tree, pkey = carry
            direction = dirs[tree.depth].astype(jnp.float32)
            go_right = direction > 0
            edge = (
                jnp.where(go_right, tree.z_right, tree.z_left),
                jnp.where(go_right, tree.r_right, tree.r_left),
                jnp.where(go_right, tree.g_right, tree.g_left),
            )
            sub, pkey = build_subtree(pkey, edge, direction, depth_static)

            # biased progressive sampling between old tree and new subtree
            lsw_new = jnp.logaddexp(tree.log_sum_w, sub["log_sum_w"])
            pkey, skey = jax.random.split(pkey)
            accept_new = (
                jnp.log(jax.random.uniform(skey, (), minval=1e-38))
                < sub["log_sum_w"] - tree.log_sum_w
            ) & (~sub["turning"]) & (~sub["diverging"])
            zp, pep, gp = sub["prop"]

            # merged-tree U-turn check
            r_sum_tot = tree.r_sum + sub["r_sum"]
            new_left = jnp.where(go_right, tree.r_left, sub["r_last"])
            new_right = jnp.where(go_right, sub["r_last"], tree.r_right)
            turned_tot = _is_turning(r_sum_tot, new_left, new_right, chol_cov)

            new_tree = _TreeState(
                z_left=jnp.where(go_right, tree.z_left, sub["z_last"]),
                r_left=jnp.where(go_right, tree.r_left, sub["r_last"]),
                g_left=jnp.where(go_right, tree.g_left, sub["g_last"]),
                z_right=jnp.where(go_right, sub["z_last"], tree.z_right),
                r_right=jnp.where(go_right, sub["r_last"], tree.r_right),
                g_right=jnp.where(go_right, sub["g_last"], tree.g_right),
                z_prop=jnp.where(accept_new, zp, tree.z_prop),
                pe_prop=jnp.where(accept_new, pep, tree.pe_prop),
                g_prop=jnp.where(accept_new, gp, tree.g_prop),
                r_sum=r_sum_tot,
                log_sum_w=lsw_new,
                depth=tree.depth + 1,
                turning=sub["turning"] | turned_tot,
                diverging=sub["diverging"],
                sum_accept=tree.sum_accept + sub["sum_accept"],
                num_leaves=tree.num_leaves + sub["num_leaves"],
            )
            return new_tree, pkey

        return fn

    branches = [make_double(j) for j in range(max_depth)]

    def outer_body(carry):
        tree, pkey = carry
        return jax.lax.switch(tree.depth, branches, (tree, pkey))

    tree, _ = jax.lax.while_loop(
        double_cond, outer_body, (init_tree, key_prop)
    )

    accept_mean = tree.sum_accept / jnp.maximum(tree.num_leaves, 1.0)
    stats = dict(
        accept_prob=accept_mean,
        diverging=tree.diverging,
        depth=tree.depth,
        num_leaves=tree.num_leaves,
    )
    return tree.z_prop, tree.pe_prop, tree.g_prop, stats


# --------------------------------------------------------------------------- #
# Dual averaging + windowed dense mass adaptation (Stan-style schedule)
# --------------------------------------------------------------------------- #
class DAState(NamedTuple):
    log_eps: Array
    log_eps_avg: Array
    h_avg: Array
    mu: Array
    t: Array


def da_init(eps0: float) -> DAState:
    le = jnp.log(jnp.asarray(eps0))
    return DAState(
        log_eps=le, log_eps_avg=le, h_avg=jnp.asarray(0.0),
        mu=jnp.log(10.0) + le, t=jnp.asarray(0.0),
    )


def da_update(state: DAState, accept_prob: Array, target: float = 0.8) -> DAState:
    t = state.t + 1.0
    gamma, t0, kappa = 0.05, 10.0, 0.75
    h = (1.0 / (t + t0)) * (target - accept_prob) + (
        1.0 - 1.0 / (t + t0)
    ) * state.h_avg
    log_eps = state.mu - jnp.sqrt(t) / gamma * h
    w = t ** (-kappa)
    log_eps_avg = w * log_eps + (1.0 - w) * state.log_eps_avg
    return DAState(log_eps, log_eps_avg, h, state.mu, t)


def _warmup_schedule(num_warmup: int):
    """Stan-style (init 75, windows 25/50/100/..., term 50) — returns the
    list of steps at which the mass matrix is re-estimated and dual
    averaging restarts."""
    if num_warmup < 20:
        return []
    init_buf = min(75, int(0.15 * num_warmup))
    term_buf = min(50, int(0.1 * num_warmup))
    boundaries = []
    pos = init_buf
    w = 25
    while pos + w < num_warmup - term_buf:
        pos += w
        boundaries.append(pos)
        w *= 2
    boundaries.append(num_warmup - term_buf)
    return sorted(set(boundaries))


def run_nuts(
    potential: Callable[[Array], Array],
    z0: Array,
    key: Array,
    num_warmup: int = 512,
    num_samples: int = 256,
    max_depth: int = 6,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    dense_mass: bool = True,
) -> tuple[Array, dict]:
    """Run NUTS chains. `z0: (chains, k)` initial points (each chain a
    vmapped lane). Returns `(samples: (chains, num_samples, k), stats)`.

    Matches the reference budget semantics (`fit.py:337-380`): warmup with
    step-size + dense-mass adaptation, then `num_samples` kept draws
    (thinning is applied by the caller).
    """
    chains, k = z0.shape
    pg = jax.value_and_grad(potential)

    def pg_safe(z):
        v, g = pg(z)
        bad = ~jnp.isfinite(v)
        return jnp.where(bad, jnp.inf, v), jnp.where(
            jnp.isfinite(g), g, 0.0
        )

    step = jax.vmap(
        lambda z, pe, g, key, eps, chol: nuts_transition(
            pg_safe, z, pe, g, key, (eps, chol), max_depth
        ),
        in_axes=(0, 0, 0, 0, 0, None),
    )

    pe0, g0 = jax.vmap(pg_safe)(z0)

    boundaries = _warmup_schedule(num_warmup)
    chol0 = jnp.eye(k)

    def warmup_body(carry, it):
        z, pe, g, da, chol, wsum, wsq, wn, key = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, chains)
        eps = jnp.exp(da.log_eps) * jnp.ones((chains,))
        z, pe, g, stats = step(z, pe, g, keys, eps, chol)
        da = da_update(da, jnp.mean(stats["accept_prob"]), target_accept)

        # accumulate z moments for the mass estimate (all chains pooled)
        wsum = wsum + jnp.sum(z, axis=0)
        wsq = wsq + z.T @ z
        wn = wn + chains

        def refresh(ops):
            da, chol, wsum, wsq, wn = ops
            n = jnp.maximum(wn, 2.0)
            mean = wsum / n
            cov = wsq / n - jnp.outer(mean, mean)
            # Stan shrinkage toward identity
            shrink = n / (n + 5.0)
            cov = shrink * cov + (1e-3 * (5.0 / (n + 5.0))) * jnp.eye(k)
            if not dense_mass:
                cov = jnp.diag(jnp.diag(cov))
            chol_new = jnp.linalg.cholesky(cov)
            ok = jnp.all(jnp.isfinite(chol_new))
            chol_new = jnp.where(ok, chol_new, chol)
            da_new = da_init(1.0)._replace(
                log_eps=da.log_eps_avg, mu=jnp.log(10.0) + da.log_eps_avg,
                log_eps_avg=da.log_eps_avg,
            )
            return da_new, chol_new, jnp.zeros((k,)), jnp.zeros((k, k)), 0.0

        is_boundary = jnp.any(
            jnp.asarray([it == b for b in boundaries])
        ) if boundaries else jnp.bool_(False)
        da, chol, wsum, wsq, wn = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_boundary, a, b),
            refresh((da, chol, wsum, wsq, wn)),
            (da, chol, wsum, wsq, wn),
        )
        return (z, pe, g, da, chol, wsum, wsq, wn, key), None

    da0 = da_init(init_step_size)
    carry = (z0, pe0, g0, da0, chol0, jnp.zeros((k,)), jnp.zeros((k, k)),
             jnp.asarray(0.0), key)
    carry, _ = jax.lax.scan(warmup_body, carry, jnp.arange(num_warmup))
    z, pe, g, da, chol, _, _, _, key = carry
    eps_final = jnp.exp(da.log_eps_avg) * jnp.ones((chains,))

    def sample_body(carry, _):
        z, pe, g, key = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, chains)
        z, pe, g, stats = step(z, pe, g, keys, eps_final, chol)
        return (z, pe, g, key), (z, stats["accept_prob"], stats["diverging"])

    (_, _, _, _), (samples, accepts, divs) = jax.lax.scan(
        sample_body, (z, pe, g, key), None, length=num_samples
    )
    samples = jnp.swapaxes(samples, 0, 1)  # (chains, num_samples, k)
    stats = dict(
        accept_prob=jnp.mean(accepts),
        divergence_rate=jnp.mean(divs.astype(jnp.float32)),
        step_size=eps_final[0],
    )
    return samples, stats
