r"""Constrained, multi-fidelity, and sensitivity-analysis test problems.

Counterpart of the reference's constrained synthetic problems
(`test_functions/synthetic.py`: PressureVessel, WeldedBeamSO,
TensionCompressionString, SpeedReducer), `test_functions/multi_fidelity.py`
(AugmentedBranin/Hartmann), and `test_functions/sensitivity_analysis.py`
(Ishigami, Gsobol, Morris).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.test_functions.synthetic import Branin, Hartmann, SyntheticTestFunction

Array = jax.Array


class ConstrainedSyntheticTestFunction(SyntheticTestFunction):
    """Problems with `c_i(x) <= 0` feasibility constraints
    (reference `test_functions/base.py` `ConstrainedBaseTestProblem`)."""

    num_constraints: int = 1

    def evaluate_slack(self, X: Array) -> Array:
        """`(..., num_constraints)`; feasible iff all >= 0 (reference
        slack convention)."""
        raise NotImplementedError

    def is_feasible(self, X: Array) -> Array:
        return jnp.all(self.evaluate_slack(X) >= 0, axis=-1)


class PressureVessel(ConstrainedSyntheticTestFunction):
    """4-d pressure-vessel design (reference `synthetic.py` PressureVessel)."""

    dim = 4
    num_constraints = 4
    _bounds = [(0.0, 10.0), (0.0, 10.0), (10.0, 50.0), (150.0, 200.0)]
    _optimal_value = 5804.37  # best known feasible
    _optimizers = []

    def evaluate_true(self, X):
        x1, x2, x3, x4 = (X[..., i] for i in range(4))
        return (
            0.6224 * x1 * x3 * x4
            + 1.7781 * x2 * x3**2
            + 3.1661 * x1**2 * x4
            + 19.84 * x1**2 * x3
        )

    def evaluate_slack(self, X):
        x1, x2, x3, x4 = (X[..., i] for i in range(4))
        g1 = x1 - 0.0193 * x3
        g2 = x2 - 0.00954 * x3
        g3 = (
            math.pi * x3**2 * x4
            + (4.0 / 3.0) * math.pi * x3**3
            - 1296000.0
        )
        g4 = 240.0 - x4
        return jnp.stack([g1, g2, g3, g4], axis=-1)


class TensionCompressionString(ConstrainedSyntheticTestFunction):
    dim = 3
    num_constraints = 4
    _bounds = [(0.01, 1.0), (0.01, 1.0), (0.01, 20.0)]
    _optimal_value = 0.012665
    _optimizers = []

    def evaluate_true(self, X):
        x1, x2, x3 = X[..., 0], X[..., 1], X[..., 2]
        return x1**2 * x2 * (x3 + 2)

    def evaluate_slack(self, X):
        x1, x2, x3 = X[..., 0], X[..., 1], X[..., 2]
        g1 = 1.0 - x2**3 * x3 / (71785.0 * x1**4)
        g2 = (
            (4 * x2**2 - x1 * x2) / (12566.0 * (x2 * x1**3 - x1**4))
            + 1.0 / (5108.0 * x1**2)
            - 1.0
        )
        g3 = 1.0 - 140.45 * x1 / (x2**2 * x3)
        g4 = (x1 + x2) / 1.5 - 1.0
        return -jnp.stack([g1, g2, g3, g4], axis=-1)


class WeldedBeamSO(ConstrainedSyntheticTestFunction):
    """Single-objective welded-beam design."""

    dim = 4
    num_constraints = 6
    _bounds = [(0.125, 10.0), (0.1, 10.0), (0.1, 10.0), (0.1, 10.0)]
    _optimal_value = 1.7250
    _optimizers = []

    def evaluate_true(self, X):
        x1, x2, x3, x4 = (X[..., i] for i in range(4))
        return 1.10471 * x1**2 * x2 + 0.04811 * x3 * x4 * (14.0 + x2)

    def evaluate_slack(self, X):
        x1, x2, x3, x4 = (X[..., i] for i in range(4))
        P, L, E, G = 6000.0, 14.0, 30e6, 12e6
        t_max, s_max, d_max = 13600.0, 30000.0, 0.25
        M = P * (L + x2 / 2)
        R = jnp.sqrt(x2**2 / 4 + ((x1 + x3) / 2) ** 2)
        J = 2 * (math.sqrt(2) * x1 * x2 * (x2**2 / 12 + ((x1 + x3) / 2) ** 2))
        t1 = P / (math.sqrt(2) * x1 * x2)
        t2 = M * R / J
        tau = jnp.sqrt(t1**2 + 2 * t1 * t2 * x2 / (2 * R) + t2**2)
        sigma = 6 * P * L / (x4 * x3**2)
        Pc = (
            4.013 * E * jnp.sqrt(x3**2 * x4**6 / 36) / L**2
            * (1 - x3 / (2 * L) * math.sqrt(E / (4 * G)))
        )
        delta = 4 * P * L**3 / (E * x3**3 * x4)
        g1 = t_max - tau
        g2 = s_max - sigma
        g3 = x4 - x1
        g4 = Pc - P
        g5 = d_max - delta
        g6 = x2 - 0.1  # weld length floor
        return jnp.stack([g1, g2, g3, g4, g5, g6], axis=-1)


class SpeedReducer(ConstrainedSyntheticTestFunction):
    """7-d speed-reducer design with 11 black-box constraints (reference
    `synthetic.py:1120`, [Lemonge2010constrained])."""

    dim = 7
    num_constraints = 11
    _bounds = [
        (2.6, 3.6),
        (0.7, 0.8),
        (17.0, 28.0),
        (7.3, 8.3),
        (7.8, 8.3),
        (2.9, 3.9),
        (5.0, 5.5),
    ]
    _optimal_value = 2996.3482
    _optimizers = []

    def evaluate_true(self, X):
        x1, x2, x3, x4, x5, x6, x7 = (X[..., i] for i in range(7))
        return (
            0.7854 * x1 * x2**2 * (3.3333 * x3**2 + 14.9334 * x3 - 43.0934)
            - 1.508 * x1 * (x6**2 + x7**2)
            + 7.4777 * (x6**3 + x7**3)
            + 0.7854 * (x4 * x6**2 + x5 * x7**2)
        )

    def evaluate_slack(self, X):
        x1, x2, x3, x4, x5, x6, x7 = (X[..., i] for i in range(7))
        return -jnp.stack(
            [
                27.0 / (x1 * x2**2 * x3) - 1.0,
                397.5 / (x1 * x2**2 * x3**2) - 1.0,
                1.93 * x4**3 / (x2 * x3 * x6**4) - 1.0,
                1.93 * x5**3 / (x2 * x3 * x7**4) - 1.0,
                jnp.sqrt(jnp.square(745.0 * x4 / (x2 * x3)) + 16.9e6)
                / (0.1 * x6**3)
                - 1100.0,
                jnp.sqrt(jnp.square(745.0 * x5 / (x2 * x3)) + 157.5e6)
                / (0.1 * x7**3)
                - 850.0,
                x2 * x3 - 40.0,
                5.0 - x1 / x2,
                x1 / x2 - 12.0,
                (1.5 * x6 + 1.9) / x4 - 1.0,
                (1.1 * x7 + 1.9) / x5 - 1.0,
            ],
            axis=-1,
        )


# --------------------------------------------------------------------------- #
class AugmentedBranin(SyntheticTestFunction):
    """Branin with a fidelity parameter `s` as dim 2 (reference
    `multi_fidelity.py:152`): low fidelity shifts the `b` coefficient."""

    dim = 3
    _bounds = [(-5.0, 10.0), (0.0, 15.0), (0.0, 1.0)]
    _optimal_value = 0.397887
    _optimizers = []

    def evaluate_true(self, X):
        x1, x2, s = X[..., 0], X[..., 1], X[..., 2]
        b = 5.1 / (4 * math.pi**2) - 0.1 * (1.0 - s)
        c, r = 5.0 / math.pi, 6.0
        t = 1.0 / (8 * math.pi)
        return (
            (x2 - b * x1**2 + c * x1 - r) ** 2
            + 10.0 * (1 - t) * jnp.cos(x1)
            + 10.0
        )


class AugmentedHartmann(SyntheticTestFunction):
    """Hartmann-6 with fidelity dim 6 (reference `multi_fidelity.py`)."""

    dim = 7
    _bounds = [(0.0, 1.0)] * 7
    _optimal_value = -3.32237
    _optimizers = []

    def __init__(self, **kw):
        self._h = Hartmann(dim=6)
        super().__init__(**kw)

    def evaluate_true(self, X):
        s = X[..., 6]
        inner = jnp.sum(
            self._h.A * jnp.square(X[..., None, :6] - self._h.P), axis=-1
        )
        alpha = jnp.asarray(self._h.ALPHA, X.dtype)
        alpha1 = alpha.at[0].set(1.0)
        # fidelity perturbs the first alpha coefficient
        a0 = 1.0 - 0.1 * (1.0 - s)
        vals = jnp.exp(-inner)
        return -(a0 * vals[..., 0] + jnp.sum(alpha[1:] * vals[..., 1:], axis=-1))


class AugmentedRosenbrock(SyntheticTestFunction):
    """Rosenbrock with the last two dims as fidelity parameters (reference
    `multi_fidelity.py:114`); minimum 0 at (1, ..., 1) and full fidelity."""

    _optimal_value = 0.0

    def __init__(self, dim: int = 3, **kw):
        if dim < 3:
            raise ValueError("AugmentedRosenbrock needs dim >= 3")
        self.dim = dim
        self._bounds = [(-5.0, 10.0)] * dim
        self._optimizers = [tuple(1.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        X_curr = X[..., :-3]
        X_next = X[..., 1:-2]
        t1 = 100.0 * jnp.square(
            X_next - jnp.square(X_curr) + 0.1 * (1.0 - X[..., -2:-1])
        )
        t2 = jnp.square(X_curr - 1.0 + 0.1 * jnp.square(1.0 - X[..., -1:]))
        return jnp.sum(t1 + t2, axis=-1)


# --------------------------------------------------------------------------- #
class Ishigami(SyntheticTestFunction):
    """Sensitivity-analysis standard (reference
    `sensitivity_analysis.py:279`)."""

    dim = 3
    _bounds = [(-math.pi, math.pi)] * 3
    _optimal_value = float("nan")
    _optimizers = []

    def __init__(self, a: float = 7.0, b: float = 0.1, **kw):
        self.a, self.b = a, b
        super().__init__(**kw)

    def evaluate_true(self, X):
        x1, x2, x3 = X[..., 0], X[..., 1], X[..., 2]
        return (
            jnp.sin(x1)
            + self.a * jnp.square(jnp.sin(x2))
            + self.b * x3**4 * jnp.sin(x1)
        )


class Gsobol(SyntheticTestFunction):
    def __init__(self, dim: int = 6, **kw):
        self.dim = dim
        self._bounds = [(0.0, 1.0)] * dim
        self._optimal_value = float("nan")
        self._optimizers = []
        self.a = jnp.asarray([(i - 1.0) / 2.0 for i in range(1, dim + 1)])
        super().__init__(**kw)

    def evaluate_true(self, X):
        return jnp.prod(
            (jnp.abs(4.0 * X - 2.0) + self.a) / (1.0 + self.a), axis=-1
        )


class Morris(SyntheticTestFunction):
    """20-d Morris screening function (reference `sensitivity_analysis.py`)."""

    dim = 20
    _bounds = [(0.0, 1.0)] * 20
    _optimal_value = float("nan")
    _optimizers = []

    def evaluate_true(self, X):
        W = 2.0 * (X - 0.5)
        idx = jnp.asarray([2, 4, 6])  # dims 3,5,7 (0-based) get the alt form
        W = W.at[..., idx].set(
            2.0 * (1.1 * X[..., idx] / (X[..., idx] + 0.1) - 0.5)
        )
        out = jnp.zeros(X.shape[:-1])
        for i in range(20):
            b = 20.0 if i < 10 else (-15.0) ** 0  # b_i = 20 for first 10, else 1...
            out = out + (20.0 if i < 10 else 1.0) * W[..., i]
        for i in range(19):
            for j in range(i + 1, 20):
                out = out + (-15.0 if (i < 6 and j < 6) else 1.0) * W[..., i] * W[..., j]
        return out


CONSTRAINED_PROBLEMS = {
    c.__name__: c
    for c in [PressureVessel, TensionCompressionString, WeldedBeamSO, SpeedReducer]
}


class ConstrainedGramacy(ConstrainedSyntheticTestFunction):
    """2-d Gramacy problem (reference `synthetic.py:889`): minimize
    `x1 + x2` s.t. `1.5 - x1 - 2 x2 - 0.5 sin(2 pi (x1^2 - 2 x2)) <= 0`
    and `x1^2 + x2^2 - 1.5 <= 0`."""

    dim = 2
    num_constraints = 2
    _bounds = [(0.0, 1.0), (0.0, 1.0)]
    _optimal_value = 0.5998
    _optimizers = [(0.1954, 0.4044)]

    def evaluate_true(self, X):
        return jnp.sum(X, axis=-1)

    def evaluate_slack(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        c1 = 1.5 - x1 - 2 * x2 - 0.5 * jnp.sin(
            2 * math.pi * (jnp.square(x1) - 2 * x2)
        )
        c2 = jnp.square(x1) + jnp.square(x2) - 1.5
        return jnp.stack([-c1, -c2], axis=-1)


class ConstrainedHartmann(Hartmann, ConstrainedSyntheticTestFunction):
    """Hartmann with `||x||_2 <= 1` (reference `synthetic.py:922`,
    [Letham2019])."""

    num_constraints = 1

    def evaluate_slack(self, X):
        return 1.0 - jnp.linalg.norm(X, axis=-1, keepdims=True)


class ConstrainedHartmannSmooth(Hartmann, ConstrainedSyntheticTestFunction):
    """Hartmann with the smooth constraint `||x||_2^2 <= 1` (reference
    `synthetic.py:960`)."""

    num_constraints = 1

    def evaluate_slack(self, X):
        return 1.0 - jnp.sum(jnp.square(X), axis=-1, keepdims=True)
