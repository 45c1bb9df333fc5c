r"""Multi-objective MC acquisition functions: q(Log)EHVI, q(Log)NEHVI.

Counterpart of `botorch/acquisition/multi_objective/monte_carlo.py`
(`qExpectedHypervolumeImprovement :146`,
`qNoisyExpectedHypervolumeImprovement :325`) and the log variants
(`multi_objective/logei.py:48,320`).

Hypervolume improvement of a q-batch is computed per MC sample by
inclusion-exclusion over the 2^q - 1 non-empty candidate subsets against a
box decomposition of the non-dominated region
(`utils/multi_objective/hypervolume.py:448-506` semantics). Subset
membership masks are static (q is a compile-time constant), so the whole
computation is one fused einsum-like reduction on device.

qNEHVI per-sample cell bounds: for m = 2 the staircase decomposition is
pure JAX and is vmapped over MC samples ON DEVICE — where the reference
loops box decompositions on the host per sample (`hypervolume.py:507-833`).
For m >= 3 the cells are computed host-side ONCE at construction from the
baseline samples (valid because base samples are fixed — the SAA
contract), padded across samples.

Log variants: cell overlaps are smoothed with the fat-tailed softplus
(`fatplus`) so far-field gradients decay polynomially, and the logarithm
is taken of the aggregated HVI (a simplification of the reference's
term-paired log-space inclusion-exclusion that preserves the gradient-flow
property; values agree with log(qEHVI) to smoothing error).
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from botorch_tpu.acquisition.monte_carlo import (
    DEFAULT_MC_SAMPLES,
    MCAcquisitionFunction,
    _draw_base_samples,
    smoothed_feasibility_log_indicator,
)
from botorch_tpu.models.gp import SingleTaskGP
from botorch_tpu.utils import safe_math as sm
from botorch_tpu.utils.multi_objective import (
    is_non_dominated,
    nondominated_hypercell_bounds_2d,
    nondominated_hypercell_bounds_np,
)

Array = jax.Array

CLIP_MAX = 1e8


def _subset_masks(q: int) -> Array:
    """(2^q - 1, q) boolean masks of non-empty subsets + their
    inclusion-exclusion signs (2^q - 1,)."""
    masks = []
    signs = []
    for r in range(1, q + 1):
        for comb in itertools.combinations(range(q), r):
            row = np.zeros(q, bool)
            row[list(comb)] = True
            masks.append(row)
            signs.append((-1.0) ** (r + 1))
    return jnp.asarray(np.stack(masks)), jnp.asarray(np.asarray(signs))


def _hvi_from_cells(
    F: Array,  # (..., q, m) objective samples of the candidates
    cell_lower: Array,  # (..., C, m)
    cell_upper: Array,  # (..., C, m)
    masks: Array,  # (S, q)
    signs: Array,  # (S,)
    smooth_tau: float = 0.0,
) -> Array:
    """Inclusion-exclusion hypervolume improvement, batched.

    `HVI = sum_c sum_S sign_S prod_j [min(min_{i in S} F_ij, u_cj) - l_cj]^+`
    """
    big = jnp.where(masks[:, :, None], 0.0, jnp.inf)
    # subset-min over candidates: (..., S, m)
    Fmin = jnp.min(F[..., None, :, :] + big, axis=-2)
    capped = jnp.minimum(Fmin[..., :, None, :], cell_upper[..., None, :, :])
    edge = capped - cell_lower[..., None, :, :]  # (..., S, C, m)
    if smooth_tau > 0:
        edge = sm.fatplus(edge, tau=smooth_tau)
    else:
        edge = jnp.maximum(edge, 0.0)
    vol = jnp.prod(edge, axis=-1)  # (..., S, C)
    return jnp.sum(signs[..., :, None] * vol, axis=(-1, -2))


class qExpectedHypervolumeImprovement(MCAcquisitionFunction):
    """qEHVI over a fixed decomposition of the current non-dominated region
    (reference `multi_objective/monte_carlo.py:146`)."""

    ref_point: Array = None
    cell_lower: Array = None  # (C, m)
    cell_upper: Array = None
    masks: Array = None
    signs: Array = None
    smooth_tau: float = struct.field(pytree_node=False, default=0.0)
    _log: bool = struct.field(pytree_node=False, default=False)

    def _hvi(self, X: Array) -> Array:
        samples, _ = self._samples_and_obj(X)  # (nmc, [S,] q, m)
        if self.constraints:
            # feasibility-weight each candidate's contribution by pushing
            # infeasible samples to the reference point (zero improvement)
            feas = smoothed_feasibility_log_indicator(
                self.constraints, samples, self.eta, fat=self._fat
            )
            w = jnp.exp(feas)[..., None]
            samples = self.ref_point + w * (samples - self.ref_point)
        return _hvi_from_cells(
            samples, self.cell_lower, self.cell_upper, self.masks, self.signs,
            smooth_tau=self.smooth_tau,
        )

    def __call__(self, X: Array) -> Array:
        hvi = self._hvi(self._with_pending(X))
        return jnp.mean(hvi)


class qLogExpectedHypervolumeImprovement(qExpectedHypervolumeImprovement):
    """log qEHVI with fat-tailed smoothing (reference
    `multi_objective/logei.py:48` semantics)."""

    smooth_tau: float = struct.field(pytree_node=False, default=1e-3)
    _log: bool = struct.field(pytree_node=False, default=True)
    _fat: bool = struct.field(pytree_node=False, default=True)

    def __call__(self, X: Array) -> Array:
        hvi = self._hvi(self._with_pending(X))
        log_hvi = jnp.log(jnp.maximum(hvi, 1e-30))
        return sm.logmeanexp(log_hvi.reshape(-1), axis=0)


class qNoisyExpectedHypervolumeImprovement(MCAcquisitionFunction):
    """qNEHVI (reference `multi_objective/monte_carlo.py:325`): HVI against
    PER-SAMPLE box decompositions of the noisy baseline front.

    For m = 2, cells are built in-graph per MC sample (vmapped staircase).
    For m >= 3, `cell_lower/upper` hold construction-time per-sample cells
    `(nmc, C, m)` computed from the (deterministic) baseline samples.
    """

    X_baseline: Array = None
    ref_point: Array = None
    masks: Array = None
    signs: Array = None
    cell_lower: Optional[Array] = None  # (nmc, C, m) for m >= 3
    cell_upper: Optional[Array] = None
    # (nb,) bool — padded-baseline support for the compiled MO BO loop
    # (same contract as qLogNEI's baseline_mask): masked-out baseline rows
    # are moved strictly below the reference point so they contribute no
    # cells to the per-sample front decompositions.
    baseline_mask: Optional[Array] = None
    smooth_tau: float = struct.field(pytree_node=False, default=0.0)
    _log: bool = struct.field(pytree_node=False, default=False)

    def _joint_samples(self, X: Array):
        nb = self.X_baseline.shape[-2]
        X_full = jnp.concatenate([self.X_baseline, X], axis=-2)
        samples, _ = self._samples_and_obj(X_full)
        return samples[..., :nb, :], samples[..., nb:, :]

    def _hvi(self, X: Array) -> Array:
        base_samples, cand_samples = self._joint_samples(X)
        if self.baseline_mask is not None:
            base_samples = jnp.where(
                self.baseline_mask[..., :, None],
                base_samples,
                self.ref_point - 1.0,
            )
        if self.constraints:
            feas_b = smoothed_feasibility_log_indicator(
                self.constraints, base_samples, self.eta, fat=self._fat
            )
            base_samples = jnp.where(
                (feas_b > math.log(0.5))[..., None], base_samples,
                self.ref_point,
            )
            feas_c = smoothed_feasibility_log_indicator(
                self.constraints, cand_samples, self.eta, fat=self._fat
            )
            w = jnp.exp(feas_c)[..., None]
            cand_samples = self.ref_point + w * (cand_samples - self.ref_point)
        m = cand_samples.shape[-1]
        if self.cell_lower is not None:
            if self.constraints:
                # precomputed cells come from UNSHIFTED baseline samples;
                # the outcome-constraint path re-shifts baselines per
                # evaluation, so mixing the two silently overstates HVI
                raise ValueError(
                    "outcome-constrained qNEHVI must not carry "
                    "construction-time cells (cell_lower); build without "
                    "them so cells follow the constraint-shifted "
                    "baselines"
                )
            lo, up = self.cell_lower, self.cell_upper
            # broadcast over ensemble dims if present
            extra = cand_samples.ndim - 3
            for _ in range(extra):
                lo, up = lo[:, None], up[:, None]
        else:
            # in-graph per-MC-sample cells (m = 2 staircase / m >= 3
            # padded Lacour; jit-compatible — this is what lifts the
            # round-2 m == 2 limit of the fully-compiled MO loop)
            lo, up = cells_from_baseline_samples(
                base_samples, self.ref_point, clip_max=CLIP_MAX
            )
        return _hvi_from_cells(
            cand_samples, lo, up, self.masks, self.signs,
            smooth_tau=self.smooth_tau,
        )

    def __call__(self, X: Array) -> Array:
        return jnp.mean(self._hvi(self._with_pending(X)))


class qLogNoisyExpectedHypervolumeImprovement(qNoisyExpectedHypervolumeImprovement):
    """log qNEHVI with fat-tailed smoothing (reference
    `multi_objective/logei.py:320` semantics)."""

    smooth_tau: float = struct.field(pytree_node=False, default=1e-3)
    _log: bool = struct.field(pytree_node=False, default=True)
    _fat: bool = struct.field(pytree_node=False, default=True)

    def __call__(self, X: Array) -> Array:
        hvi = self._hvi(self._with_pending(X))
        log_hvi = jnp.log(jnp.maximum(hvi, 1e-30))
        return sm.logmeanexp(log_hvi.reshape(-1), axis=0)


# --------------------------------------------------------------------------- #
def make_qehvi(
    cls,
    model: SingleTaskGP,
    ref_point: Array,
    q: int,
    Y_baseline: Array,
    num_samples: int = DEFAULT_MC_SAMPLES,
    seed: int = 0,
    **kwargs,
):
    """Build q(Log)EHVI: decompose the observed front once (host for
    m >= 3, device for m = 2), fix qMC base samples."""
    m = model.num_outputs
    ref_point = jnp.asarray(ref_point)
    nd = np.asarray(is_non_dominated(jnp.asarray(Y_baseline)))
    front = np.asarray(Y_baseline)[nd]
    front = front[(front > np.asarray(ref_point)).all(-1)]
    if m == 2 and front.shape[0] > 0:
        lo, up = nondominated_hypercell_bounds_2d(
            jnp.asarray(front), ref_point, clip_max=CLIP_MAX
        )
    elif front.shape[0] > 0:
        lo_np, up_np = nondominated_hypercell_bounds_np(
            front, np.asarray(ref_point), clip_max=CLIP_MAX
        )
        lo, up = jnp.asarray(lo_np, jnp.float32), jnp.asarray(up_np, jnp.float32)
    else:
        lo = ref_point[None, :]
        up = jnp.full((1, m), CLIP_MAX)
    masks, signs = _subset_masks(q)
    base = _draw_base_samples(q, m, num_samples, seed)
    return cls(
        model=model, cache=model.train_chol(), base_samples=base,
        ref_point=ref_point, cell_lower=lo, cell_upper=up,
        masks=masks, signs=signs, **kwargs,
    )


def cells_from_baseline_samples(
    bs: Array, ref_point: Array, clip_max: float = CLIP_MAX
):
    """Per-MC-sample nondominated cells from baseline objective samples
    `bs (..., nb, m)`: the batched 2-d staircase for m = 2, the vmapped
    padded Lacour decomposition for m >= 3. Shared by the eval-time path
    (`qNoisyExpectedHypervolumeImprovement._hvi`) and the construction-
    time precompute (`make_in_graph_nehvi_cells`) so the masking/clipping
    rules can't drift apart."""
    m = bs.shape[-1]
    ref_b = jnp.broadcast_to(ref_point, (m,))
    if m == 2:
        return nondominated_hypercell_bounds_2d(bs, ref_b, clip_max=clip_max)
    from botorch_tpu.utils.box_decomposition_jax import (
        nondominated_hypercell_bounds as _nd_cells,
    )

    lead = bs.shape[:-2]
    flat = bs.reshape(-1, *bs.shape[-2:])
    lo, up = jax.vmap(lambda y: _nd_cells(y, ref_b, clip_max=clip_max))(flat)
    return (
        lo.reshape(*lead, *lo.shape[-2:]),
        up.reshape(*lead, *up.shape[-2:]),
    )


def make_in_graph_nehvi_cells(
    model,
    cache,
    X_baseline: Array,
    base_prefix: Array,
    ref_point: Array,
    baseline_mask: Optional[Array] = None,
    clip_max: float = CLIP_MAX,
):
    """Per-MC-sample nondominated cells for m >= 3 qNEHVI, computed ONCE
    inside jit from the baseline block of the SAA base samples.

    The baseline rows of the joint SAA samples are X-independent (the
    joint Cholesky's top-left block is chol(K_bb)), so the decomposition
    is a constant of the acquisition — computing it here and passing it
    as `cell_lower/cell_upper` keeps the O(nb * |U|) Lacour scans out of
    every L-BFGS value/grad evaluation (they are NOT hoistable by XLA
    once expressed downstream of the joint posterior). Only valid for
    unconstrained qNEHVI (outcome constraints re-shift baseline samples
    per evaluation).
    """
    if tuple(getattr(model, "batch_shape", ())):
        # ensemble models: the baseline samples gain an ensemble axis the
        # (nmc, nb, m) base prefix does not broadcast against here; the
        # eval-time path in `_hvi` handles those dims — use it instead.
        raise ValueError(
            "make_in_graph_nehvi_cells requires an unbatched model; "
            f"got batch_shape {tuple(model.batch_shape)} (ensemble "
            "models use the eval-time cell path)"
        )
    post = model.posterior(X_baseline, cache=cache)
    bs = post.rsample_from_base_samples(base_prefix)  # (nmc, nb, m)
    ref_b = jnp.broadcast_to(ref_point, (bs.shape[-1],))
    if baseline_mask is not None:
        bs = jnp.where(baseline_mask[..., :, None], bs, ref_b - 1.0)
    return cells_from_baseline_samples(bs, ref_point, clip_max=clip_max)


def make_qnehvi(
    cls,
    model: SingleTaskGP,
    ref_point: Array,
    q: int,
    X_baseline: Array,
    num_samples: int = DEFAULT_MC_SAMPLES,
    seed: int = 0,
    prune_baseline: bool = False,
    **kwargs,
):
    """Build q(Log)NEHVI with fixed base samples; m >= 3 precomputes
    per-sample cells host-side from the (deterministic) baseline samples
    (the cached-cell construction, `hypervolume.py:654-833`).
    `prune_baseline=True` keeps only baseline points with nonzero empirical
    probability of being Pareto-optimal (reference
    `multi_objective/monte_carlo.py:325` ctor option)."""
    m = model.num_outputs
    ref_point = jnp.asarray(ref_point)
    if prune_baseline:
        from botorch_tpu.acquisition.utils import (
            prune_inferior_points_multi_objective,
        )

        X_baseline = prune_inferior_points_multi_objective(
            model, X_baseline, ref_point, seed=seed
        )
    nb = X_baseline.shape[-2]
    masks, signs = _subset_masks(q)
    base = _draw_base_samples(nb + q, m, num_samples, seed)
    acqf = cls(
        model=model, cache=model.train_chol(), base_samples=base,
        X_baseline=X_baseline, ref_point=ref_point,
        masks=masks, signs=signs, **kwargs,
    )
    if (
        m == 2
        and not kwargs.get("constraints")
        and not tuple(getattr(model, "batch_shape", ()))
    ):
        # the baseline block of the SAA samples is X-independent, so the
        # per-sample staircase cells are a constant of the acquisition —
        # precompute them so L-BFGS evaluations skip the per-eval sort
        # (outcome-constrained qNEHVI re-shifts baselines per eval and
        # keeps the eval-time path)
        lo, up = make_in_graph_nehvi_cells(
            model, acqf.cache, X_baseline, base[:, :nb, :], ref_point,
            baseline_mask=kwargs.get("baseline_mask"),
        )
        acqf = acqf.replace(cell_lower=lo, cell_upper=up)
    if m > 2 and not kwargs.get("constraints"):
        # deterministic baseline samples (base-sample prefix only).
        # Outcome-constrained qNEHVI must NOT carry construction-time
        # cells: the eval path re-shifts baseline samples by feasibility
        # per evaluation, and `_hvi` rejects the combination — the
        # in-graph `cells_from_baseline_samples` path handles it.
        post = model.posterior(X_baseline, cache=acqf.cache)
        bs = post.rsample_from_base_samples(base[:, :nb, :])
        bs_np = np.asarray(bs)
        ref_np = np.asarray(ref_point)
        # honor a padded-baseline mask on the host-cell path too: masked
        # rows are moved strictly below ref so they never enter a front
        # (the m=2 in-graph path applies the same rule at eval time)
        bm = kwargs.get("baseline_mask")
        if bm is not None:
            bs_np = np.where(
                np.asarray(bm)[None, :, None], bs_np, ref_np - 1.0
            )
        fronts = []
        for s in range(bs_np.shape[0]):
            Y = bs_np[s]
            nd = np.asarray(is_non_dominated(jnp.asarray(Y)))
            front = Y[nd]
            fronts.append(front[(front > ref_np).all(-1)])

        from botorch_tpu.utils.native import decompose_batch_native

        native = decompose_batch_native(fronts, ref_np, clip_max=CLIP_MAX)
        if native is not None:
            # C++ engine (csrc/box_decomposition.cpp): ~80x the numpy path
            lo64, up64, counts = native
            # empty fronts get one full-region cell [ref, clip]
            for s, f in enumerate(fronts):
                if f.shape[0] == 0:
                    lo64[s, 0], up64[s, 0] = ref_np, np.full((m,), CLIP_MAX)
            lo = lo64.astype(np.float32)
            up = up64.astype(np.float32)
        else:
            cells = []
            for front in fronts:
                if front.shape[0] == 0:
                    cells.append(
                        (ref_np[None, :], np.full((1, m), CLIP_MAX))
                    )
                else:
                    cells.append(
                        nondominated_hypercell_bounds_np(
                            front, ref_np, CLIP_MAX
                        )
                    )
            C = max(c[0].shape[0] for c in cells)
            lo = np.zeros((len(cells), C, m), np.float32)
            up = np.zeros((len(cells), C, m), np.float32)
            for s, (l, u) in enumerate(cells):
                k = l.shape[0]
                lo[s, :k], up[s, :k] = l, u
                lo[s, k:], up[s, k:] = ref_np, ref_np  # zero-volume padding
        acqf = acqf.replace(
            cell_lower=jnp.asarray(lo), cell_upper=jnp.asarray(up)
        )
    return acqf


def make_momf(
    model,
    ref_point,
    q: int,
    Y_baseline,
    fidelity_dims: tuple,
    cost_fn=None,
    num_samples: int = DEFAULT_MC_SAMPLES,
    seed: int = 0,
):
    """MOMF (reference `multi_objective/multi_fidelity.py:40`): qEHVI
    divided by an (affine) fidelity cost — multi-objective multi-fidelity
    acquisition as cost-aware hypervolume improvement."""
    from botorch_tpu.acquisition.wrappers import (
        CostAwareAcquisitionFunction,
        affine_fidelity_cost,
    )

    base = make_qehvi(
        qExpectedHypervolumeImprovement, model, ref_point, q=q,
        Y_baseline=Y_baseline, num_samples=num_samples, seed=seed,
    )
    cost = cost_fn or affine_fidelity_cost(fidelity_dims)
    return CostAwareAcquisitionFunction(acqf=base, cost_fn=cost)


class ExpectedHypervolumeImprovement(struct.PyTreeNode):
    """Analytic EHVI for q = 1 under independent-output Gaussian posteriors
    (reference `multi_objective/analytic.py:78`, [Yang2019] cell formula).

    Per non-dominated cell `[l, u]` the expected improvement factorizes
    over outputs:
      `E[(min(f_j, u_j) - l_j)^+] = sigma (phi(a_l) - phi(a_u))
         + (mu - l)(Phi(a_u) - Phi(a_l)) + (u - l)(1 - Phi(a_u))`
    with `a_x = (x - mu)/sigma` — summed over cells. Valid for any m (the
    reference's analytic version is specialized; cells here come from the
    same decomposition machinery as qEHVI).
    """

    model: SingleTaskGP
    cache: tuple = None
    cell_lower: Array = None  # (C, m)
    cell_upper: Array = None
    ref_point: Array = None

    def __call__(self, X: Array) -> Array:
        from botorch_tpu.utils.probability import ndtr as _ndtr, phi as _phi

        post = self.model.posterior(X, cache=self.cache)
        mu = post.mean[..., 0, :]  # (m,)
        sigma = jnp.sqrt(jnp.clip(post.variance[..., 0, :], 1e-12))
        l, u = self.cell_lower, self.cell_upper  # (C, m)
        a_l = (l - mu) / sigma
        a_u = (u - mu) / sigma
        seg = (
            sigma * (_phi(a_l) - _phi(a_u))
            + (mu - l) * (_ndtr(a_u) - _ndtr(a_l))
            + (u - l) * (1.0 - _ndtr(a_u))
        )
        ehvi = jnp.sum(jnp.prod(jnp.maximum(seg, 0.0), axis=-1), axis=-1)
        return jnp.mean(ehvi)  # ensemble reduce (no-op for scalars)


def make_ehvi(model, ref_point, Y_baseline):
    """Build the analytic EHVI from the observed front."""
    m = model.num_outputs
    ref_point = jnp.asarray(ref_point)
    nd = np.asarray(is_non_dominated(jnp.asarray(Y_baseline)))
    front = np.asarray(Y_baseline)[nd]
    front = front[(front > np.asarray(ref_point)).all(-1)]
    if m == 2 and front.shape[0] > 0:
        lo, up = nondominated_hypercell_bounds_2d(
            jnp.asarray(front), ref_point, clip_max=CLIP_MAX
        )
    elif front.shape[0] > 0:
        lo_np, up_np = nondominated_hypercell_bounds_np(
            front, np.asarray(ref_point), clip_max=CLIP_MAX
        )
        lo, up = jnp.asarray(lo_np, jnp.float32), jnp.asarray(up_np, jnp.float32)
    else:
        lo = ref_point[None, :]
        up = jnp.full((1, m), CLIP_MAX)
    return ExpectedHypervolumeImprovement(
        model=model, cache=model.train_chol(),
        cell_lower=lo, cell_upper=up, ref_point=ref_point,
    )
