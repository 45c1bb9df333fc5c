r"""Synthetic test problems (counterpart of
`botorch/test_functions/synthetic.py`, 30+ problems).

Each problem is a small object with `dim`, `bounds (2, d)`, `optimal_value`
(minimum — these are MINIMIZATION problems, as in the reference;
BO loops maximize `-f`), `optimizers`, and a pure batched
`__call__(X: (..., d)) -> (...)`. Formulas are the standard published
definitions; optima constants match the reference's tables
(`synthetic.py:127-1171`) as ground-truth anchors (e.g. Branin 0.397887,
Hartmann-6 -3.32237).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class SyntheticTestFunction:
    dim: int
    _bounds: list[tuple[float, float]]
    _optimal_value: float
    _optimizers: list[tuple[float, ...]] = []
    noise_std: float = 0.0

    def __init__(self, noise_std: float = 0.0, negate: bool = False, dim=None):
        if dim is not None:
            self.dim = dim
        self.noise_std = noise_std
        self.negate = negate
        self.bounds = jnp.asarray(self._bounds, dtype=jnp.float32).T  # (2, d)

    @property
    def optimal_value(self) -> float:
        return -self._optimal_value if self.negate else self._optimal_value

    @property
    def optimizers(self) -> Array:
        return jnp.asarray(self._optimizers, dtype=jnp.float32)

    def evaluate_true(self, X: Array) -> Array:
        raise NotImplementedError

    def __call__(self, X: Array, key=None) -> Array:
        f = self.evaluate_true(jnp.asarray(X))
        if self.noise_std > 0 and key is not None:
            f = f + self.noise_std * jax.random.normal(key, f.shape)
        return -f if self.negate else f


class Branin(SyntheticTestFunction):
    """Branin-Hoo (d=2); min 0.397887 at 3 points (`synthetic.py:181-197`)."""

    dim = 2
    _bounds = [(-5.0, 10.0), (0.0, 15.0)]
    _optimal_value = 0.397887
    _optimizers = [(-math.pi, 12.275), (math.pi, 2.275), (9.42478, 2.475)]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        a, b, c = 1.0, 5.1 / (4 * math.pi**2), 5.0 / math.pi
        r, s, t = 6.0, 10.0, 1.0 / (8 * math.pi)
        return a * (x2 - b * x1**2 + c * x1 - r) ** 2 + s * (1 - t) * jnp.cos(x1) + s


class Hartmann(SyntheticTestFunction):
    """Hartmann (d in {3, 4, 6}); 6-d min -3.32237 (`synthetic.py:359-400`)."""

    def __init__(self, dim: int = 6, **kw):
        if dim not in (3, 4, 6):
            raise ValueError("Hartmann dim must be 3, 4, or 6")
        self.dim = dim
        self._bounds = [(0.0, 1.0)] * dim
        self.ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
        if dim == 3:
            A = [[3.0, 10, 30], [0.1, 10, 35], [3.0, 10, 30], [0.1, 10, 35]]
            P = [
                [3689, 1170, 2673],
                [4699, 4387, 7470],
                [1091, 8732, 5547],
                [381, 5743, 8828],
            ]
            self._optimal_value = -3.86278
            self._optimizers = [(0.114614, 0.555649, 0.852547)]
        elif dim == 4:
            A = [
                [10, 3, 17, 3.5],
                [0.05, 10, 17, 0.1],
                [3, 3.5, 1.7, 10],
                [17, 8, 0.05, 10],
            ]
            P = [
                [1312, 1696, 5569, 124],
                [2329, 4135, 8307, 3736],
                [2348, 1451, 3522, 2883],
                [4047, 8828, 8732, 5743],
            ]
            self._optimal_value = -3.13449
            self._optimizers = [(0.18744, 0.194415, 0.558172, 0.264885)]
        else:
            A = [
                [10, 3, 17, 3.5, 1.7, 8],
                [0.05, 10, 17, 0.1, 8, 14],
                [3, 3.5, 1.7, 10, 17, 8],
                [17, 8, 0.05, 10, 0.1, 14],
            ]
            P = [
                [1312, 1696, 5569, 124, 8283, 5886],
                [2329, 4135, 8307, 3736, 1004, 9991],
                [2348, 1451, 3522, 2883, 3047, 6650],
                [4047, 8828, 8732, 5743, 1091, 381],
            ]
            self._optimal_value = -3.32237
            self._optimizers = [
                (0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573)
            ]
        self.A = jnp.asarray(A, jnp.float32)
        self.P = jnp.asarray(P, jnp.float32) * 1e-4
        super().__init__(**kw)

    def evaluate_true(self, X):
        inner = jnp.sum(
            self.A * jnp.square(X[..., None, :] - self.P), axis=-1
        )  # (..., 4)
        alpha = jnp.asarray(self.ALPHA, X.dtype)
        if self.dim == 4:
            return (1.1 - jnp.sum(alpha * jnp.exp(-inner), axis=-1)) / 0.839
        return -jnp.sum(alpha * jnp.exp(-inner), axis=-1)


class Ackley(SyntheticTestFunction):
    """Ackley (any d); min 0 at origin (`synthetic.py:127`)."""

    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-32.768, 32.768)] * dim
        self._optimal_value = 0.0
        self._optimizers = [tuple(0.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        a, b, c = 20.0, 0.2, 2 * math.pi
        d = self.dim
        s1 = jnp.sqrt(jnp.mean(jnp.square(X), axis=-1))
        s2 = jnp.mean(jnp.cos(c * X), axis=-1)
        return -a * jnp.exp(-b * s1) - jnp.exp(s2) + a + math.e


class Rosenbrock(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-5.0, 10.0)] * dim
        self._optimal_value = 0.0
        self._optimizers = [tuple(1.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        return jnp.sum(
            100.0 * jnp.square(X[..., 1:] - jnp.square(X[..., :-1]))
            + jnp.square(1.0 - X[..., :-1]),
            axis=-1,
        )


class Levy(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-10.0, 10.0)] * dim
        self._optimal_value = 0.0
        self._optimizers = [tuple(1.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        w = 1.0 + (X - 1.0) / 4.0
        t1 = jnp.square(jnp.sin(math.pi * w[..., 0]))
        t3 = jnp.square(w[..., -1] - 1.0) * (
            1.0 + jnp.square(jnp.sin(2 * math.pi * w[..., -1]))
        )
        wm = w[..., :-1]
        t2 = jnp.sum(
            jnp.square(wm - 1.0)
            * (1.0 + 10.0 * jnp.square(jnp.sin(math.pi * wm + 1.0))),
            axis=-1,
        )
        return t1 + t2 + t3


class Griewank(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-600.0, 600.0)] * dim
        self._optimal_value = 0.0
        self._optimizers = [tuple(0.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        i = jnp.sqrt(jnp.arange(1, self.dim + 1, dtype=X.dtype))
        return (
            jnp.sum(jnp.square(X), axis=-1) / 4000.0
            - jnp.prod(jnp.cos(X / i), axis=-1)
            + 1.0
        )


class Rastrigin(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-5.12, 5.12)] * dim
        self._optimal_value = 0.0
        self._optimizers = [tuple(0.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        return 10.0 * self.dim + jnp.sum(
            jnp.square(X) - 10.0 * jnp.cos(2 * math.pi * X), axis=-1
        )


class StyblinskiTang(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-5.0, 5.0)] * dim
        self._optimal_value = -39.166166 * dim
        self._optimizers = [tuple(-2.903534 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        return 0.5 * jnp.sum(X**4 - 16.0 * X**2 + 5.0 * X, axis=-1)


class SixHumpCamel(SyntheticTestFunction):
    dim = 2
    _bounds = [(-3.0, 3.0), (-2.0, 2.0)]
    _optimal_value = -1.0316
    _optimizers = [(0.0898, -0.7126), (-0.0898, 0.7126)]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        return (
            (4 - 2.1 * x1**2 + x1**4 / 3) * x1**2
            + x1 * x2
            + (4 * x2**2 - 4) * x2**2
        )


class ThreeHumpCamel(SyntheticTestFunction):
    dim = 2
    _bounds = [(-5.0, 5.0), (-5.0, 5.0)]
    _optimal_value = 0.0
    _optimizers = [(0.0, 0.0)]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        return 2.0 * x1**2 - 1.05 * x1**4 + x1**6 / 6.0 + x1 * x2 + x2**2


class Beale(SyntheticTestFunction):
    dim = 2
    _bounds = [(-4.5, 4.5), (-4.5, 4.5)]
    _optimal_value = 0.0
    _optimizers = [(3.0, 0.5)]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        return (
            jnp.square(1.5 - x1 + x1 * x2)
            + jnp.square(2.25 - x1 + x1 * x2**2)
            + jnp.square(2.625 - x1 + x1 * x2**3)
        )


class Bukin(SyntheticTestFunction):
    dim = 2
    _bounds = [(-15.0, -5.0), (-3.0, 3.0)]
    _optimal_value = 0.0
    _optimizers = [(-10.0, 1.0)]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        return 100.0 * jnp.sqrt(jnp.abs(x2 - 0.01 * x1**2)) + 0.01 * jnp.abs(
            x1 + 10.0
        )


class DropWave(SyntheticTestFunction):
    dim = 2
    _bounds = [(-5.12, 5.12), (-5.12, 5.12)]
    _optimal_value = -1.0
    _optimizers = [(0.0, 0.0)]

    def evaluate_true(self, X):
        r2 = jnp.sum(jnp.square(X), axis=-1)
        r = jnp.sqrt(r2)
        return -(1.0 + jnp.cos(12.0 * r)) / (0.5 * r2 + 2.0)


class DixonPrice(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(-10.0, 10.0)] * dim
        self._optimal_value = 0.0
        self._optimizers = [
            tuple(
                2.0 ** (-(2.0**i - 2.0) / 2.0**i) for i in range(1, dim + 1)
            )
        ]
        super().__init__(**kw)

    def evaluate_true(self, X):
        i = jnp.arange(2, self.dim + 1, dtype=X.dtype)
        t1 = jnp.square(X[..., 0] - 1.0)
        t2 = jnp.sum(
            i * jnp.square(2.0 * jnp.square(X[..., 1:]) - X[..., :-1]), axis=-1
        )
        return t1 + t2


class EggHolder(SyntheticTestFunction):
    dim = 2
    _bounds = [(-512.0, 512.0), (-512.0, 512.0)]
    _optimal_value = -959.6407
    _optimizers = [(512.0, 404.2319)]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        return -(x2 + 47.0) * jnp.sin(
            jnp.sqrt(jnp.abs(x2 + x1 / 2.0 + 47.0))
        ) - x1 * jnp.sin(jnp.sqrt(jnp.abs(x1 - (x2 + 47.0))))


class HolderTable(SyntheticTestFunction):
    dim = 2
    _bounds = [(-10.0, 10.0), (-10.0, 10.0)]
    _optimal_value = -19.2085
    _optimizers = [
        (8.05502, 9.66459),
        (-8.05502, 9.66459),
        (8.05502, -9.66459),
        (-8.05502, -9.66459),
    ]

    def evaluate_true(self, X):
        x1, x2 = X[..., 0], X[..., 1]
        return -jnp.abs(
            jnp.sin(x1)
            * jnp.cos(x2)
            * jnp.exp(jnp.abs(1.0 - jnp.sqrt(x1**2 + x2**2) / math.pi))
        )


class Michalewicz(SyntheticTestFunction):
    def __init__(self, dim: int = 2, **kw):
        self.dim = dim
        self._bounds = [(0.0, math.pi)] * dim
        opt = {2: -1.8013, 5: -4.687658, 10: -9.66015}
        self._optimal_value = opt.get(dim, float("nan"))
        if dim == 2:
            self._optimizers = [(2.20290552, 1.57079633)]
        super().__init__(**kw)

    def evaluate_true(self, X):
        m = 10.0
        i = jnp.arange(1, self.dim + 1, dtype=X.dtype)
        return -jnp.sum(
            jnp.sin(X) * jnp.power(jnp.sin(i * jnp.square(X) / math.pi), 2 * m),
            axis=-1,
        )


class Powell(SyntheticTestFunction):
    def __init__(self, dim: int = 4, **kw):
        if dim % 4 != 0:
            raise ValueError("Powell dim must be a multiple of 4")
        self.dim = dim
        self._bounds = [(-4.0, 5.0)] * dim
        self._optimal_value = 0.0
        self._optimizers = [tuple(0.0 for _ in range(dim))]
        super().__init__(**kw)

    def evaluate_true(self, X):
        Xr = X.reshape(*X.shape[:-1], self.dim // 4, 4)
        a, b, c, d = Xr[..., 0], Xr[..., 1], Xr[..., 2], Xr[..., 3]
        return jnp.sum(
            jnp.square(a + 10 * b)
            + 5 * jnp.square(c - d)
            + jnp.power(b - 2 * c, 4)
            + 10 * jnp.power(a - d, 4),
            axis=-1,
        )


class Shekel(SyntheticTestFunction):
    dim = 4
    _bounds = [(0.0, 10.0)] * 4
    _optimal_value = -10.5363
    _optimizers = [(4.0, 4.0, 4.0, 4.0)]

    def __init__(self, m: int = 10, **kw):
        self.m = m
        beta = [1, 2, 2, 4, 4, 6, 3, 7, 5, 5]
        C = [
            [4.0, 1.0, 8.0, 6.0, 3.0, 2.0, 5.0, 8.0, 6.0, 7.0],
            [4.0, 1.0, 8.0, 6.0, 7.0, 9.0, 3.0, 1.0, 2.0, 3.6],
            [4.0, 1.0, 8.0, 6.0, 3.0, 2.0, 3.0, 8.0, 6.0, 7.0],
            [4.0, 1.0, 8.0, 6.0, 7.0, 9.0, 3.0, 1.0, 2.0, 3.6],
        ]
        self.beta = jnp.asarray(beta, jnp.float32)[:m] / 10.0
        self.C = jnp.asarray(C, jnp.float32)[:, :m]
        super().__init__(**kw)

    def evaluate_true(self, X):
        # sum_j 1 / (beta_j + sum_i (x_i - C_ij)^2)
        diff2 = jnp.sum(
            jnp.square(X[..., :, None] - self.C), axis=-2
        )  # (..., m)
        return -jnp.sum(1.0 / (diff2 + self.beta), axis=-1)


class Cosine8(SyntheticTestFunction):
    """8-d maximization problem in the reference (`synthetic.py`): here kept
    as minimization of the negated form; min value -0.8."""

    dim = 8
    _bounds = [(-1.0, 1.0)] * 8
    _optimal_value = -0.8
    _optimizers = [tuple(0.0 for _ in range(8))]

    def evaluate_true(self, X):
        return -(
            0.1 * jnp.sum(jnp.cos(5 * math.pi * X), axis=-1)
            - jnp.sum(jnp.square(X), axis=-1)
        )


ALL_PROBLEMS = {
    cls.__name__: cls
    for cls in [
        Ackley, Beale, Branin, Bukin, Cosine8, DixonPrice, DropWave,
        EggHolder, Griewank, Hartmann, HolderTable, Levy, Michalewicz,
        Powell, Rastrigin, Rosenbrock, Shekel, SixHumpCamel,
        StyblinskiTang, ThreeHumpCamel,
    ]
}
