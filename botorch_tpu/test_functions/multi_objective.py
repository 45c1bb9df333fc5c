r"""Multi-objective test problems (counterpart of
`botorch/test_functions/multi_objective.py`: BraninCurrin, ZDT1-3,
DTLZ1-2, VehicleSafety, Penicillin, ...).

Problems are MINIMIZATION of each objective (reference convention) with
`negate=True` flipping to maximization; `max_hv` and `_ref_point` match
the reference's tables.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.test_functions.synthetic import Branin, SyntheticTestFunction

Array = jax.Array


class MultiObjectiveTestProblem(SyntheticTestFunction):
    num_objectives: int
    _ref_point: list[float]
    _max_hv: float | None = None

    @property
    def ref_point(self) -> Array:
        r = jnp.asarray(self._ref_point, jnp.float32)
        return -r if self.negate else r

    @property
    def max_hv(self) -> float:
        if self._max_hv is None:
            raise NotImplementedError
        return self._max_hv


class BraninCurrin(MultiObjectiveTestProblem):
    """Branin + Currin on [0,1]^2 (reference `multi_objective.py:BraninCurrin`)."""

    dim = 2
    num_objectives = 2
    _bounds = [(0.0, 1.0), (0.0, 1.0)]
    _ref_point = [18.0, 6.0]
    _max_hv = 59.36011874867746
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        x0, x1 = X[..., 0], X[..., 1]
        # Branin on rescaled inputs
        branin = Branin().evaluate_true(
            jnp.stack([15.0 * x0 - 5.0, 15.0 * x1], axis=-1)
        )
        currin = (1.0 - jnp.exp(-1.0 / (2.0 * jnp.where(x1 > 0, x1, 1.0)))) * (
            2300 * x0**3 + 1900 * x0**2 + 2092 * x0 + 60
        ) / (100 * x0**3 + 500 * x0**2 + 4 * x0 + 20)
        currin = jnp.where(x1 > 0, currin, (2300 * x0**3 + 1900 * x0**2 + 2092 * x0 + 60)
                           / (100 * x0**3 + 500 * x0**2 + 4 * x0 + 20))
        return jnp.stack([branin, currin], axis=-1)


class ZDT(MultiObjectiveTestProblem):
    num_objectives = 2

    def __init__(self, dim: int = 30, **kw):
        self.dim = dim
        self._bounds = [(0.0, 1.0)] * dim
        self._ref_point = [11.0, 11.0]
        self._optimal_value = float("nan")
        super().__init__(**kw)

    def _g(self, X):
        return 1.0 + 9.0 * jnp.mean(X[..., 1:], axis=-1)


class ZDT1(ZDT):
    _max_hv = 120.0 + 2.0 / 3.0

    def evaluate_true(self, X):
        f0 = X[..., 0]
        g = self._g(X)
        f1 = g * (1.0 - jnp.sqrt(f0 / g))
        return jnp.stack([f0, f1], axis=-1)


class ZDT2(ZDT):
    _max_hv = 120.0 + 1.0 / 3.0

    def evaluate_true(self, X):
        f0 = X[..., 0]
        g = self._g(X)
        f1 = g * (1.0 - jnp.square(f0 / g))
        return jnp.stack([f0, f1], axis=-1)


class ZDT3(ZDT):
    _max_hv = 128.77811613069076060

    def evaluate_true(self, X):
        f0 = X[..., 0]
        g = self._g(X)
        f1 = g * (
            1.0 - jnp.sqrt(f0 / g) - (f0 / g) * jnp.sin(10.0 * math.pi * f0)
        )
        return jnp.stack([f0, f1], axis=-1)


class DTLZ(MultiObjectiveTestProblem):
    def __init__(self, dim: int = 6, num_objectives: int = 2, **kw):
        if dim <= num_objectives:
            raise ValueError("dim must exceed num_objectives")
        self.dim = dim
        self.num_objectives = num_objectives
        self._bounds = [(0.0, 1.0)] * dim
        self.k = dim - num_objectives + 1
        self._ref_point = [self._ref_val] * num_objectives
        self._optimal_value = float("nan")
        super().__init__(**kw)


class DTLZ1(DTLZ):
    _ref_val = 400.0

    @property
    def max_hv(self) -> float:
        return self._ref_val**self.num_objectives - 1.0 / 2.0**self.num_objectives

    def evaluate_true(self, X):
        m = self.num_objectives
        Xm = X[..., -self.k :]
        g = 100.0 * (
            self.k
            + jnp.sum(
                jnp.square(Xm - 0.5) - jnp.cos(20.0 * math.pi * (Xm - 0.5)),
                axis=-1,
            )
        )
        fs = []
        for i in range(m):
            f = 0.5 * (1.0 + g)
            for j in range(m - 1 - i):
                f = f * X[..., j]
            if i > 0:
                f = f * (1.0 - X[..., m - 1 - i])
            fs.append(f)
        return jnp.stack(fs, axis=-1)


class DTLZ2(DTLZ):
    _ref_val = 1.1

    @property
    def max_hv(self) -> float:
        # ref^m minus the volume of the unit hypersphere orthant
        m = self.num_objectives
        if m % 2 == 0:
            c = (math.pi ** (m // 2)) / math.factorial(m // 2)
        else:
            c = (
                2 ** ((m + 1) / 2)
                * math.pi ** ((m - 1) / 2)
                / math.prod(range(1, m + 1, 2))
            )
        return self._ref_val**m - c / 2**m

    def evaluate_true(self, X):
        m = self.num_objectives
        Xm = X[..., -self.k :]
        g = jnp.sum(jnp.square(Xm - 0.5), axis=-1)
        fs = []
        for i in range(m):
            f = 1.0 + g
            for j in range(m - 1 - i):
                f = f * jnp.cos(0.5 * math.pi * X[..., j])
            if i > 0:
                f = f * jnp.sin(0.5 * math.pi * X[..., m - 1 - i])
            fs.append(f)
        return jnp.stack(fs, axis=-1)


class VehicleSafety(MultiObjectiveTestProblem):
    """5-d, 3-objective crashworthiness problem (reference
    `multi_objective.py:VehicleSafety`)."""

    dim = 5
    num_objectives = 3
    _bounds = [(1.0, 3.0)] * 5
    _ref_point = [1864.72022, 11.81993945, 0.2903999384]
    _max_hv = 246.81607081187002
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        X1, X2, X3, X4, X5 = (X[..., i] for i in range(5))
        f1 = (
            1640.2823 + 2.3573285 * X1 + 2.3220035 * X2 + 4.5688768 * X3
            + 7.7213633 * X4 + 4.4559504 * X5
        )
        f2 = (
            6.5856 + 1.15 * X1 - 1.0427 * X2 + 0.9738 * X3 + 0.8364 * X4
            - 0.3695 * X1 * X4 + 0.0861 * X1 * X5 + 0.3628 * X2 * X4
            - 0.1106 * X1**2 - 0.3437 * X3**2 + 0.1764 * X4**2
        )
        f3 = (
            -0.0551 + 0.0181 * X1 + 0.1024 * X2 + 0.0421 * X3
            - 0.0073 * X1 * X2 + 0.024 * X2 * X3 - 0.0118 * X2 * X4
            - 0.0204 * X3 * X4 - 0.008 * X3 * X5 - 0.0241 * X2**2
            + 0.0109 * X4**2
        )
        return jnp.stack([f1, f2, f3], axis=-1)


MO_PROBLEMS = {
    cls.__name__: cls
    for cls in [BraninCurrin, ZDT1, ZDT2, ZDT3, DTLZ1, DTLZ2, VehicleSafety]
}
