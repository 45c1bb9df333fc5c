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


class DTLZ3(DTLZ2):
    """DTLZ2 geometry with DTLZ1's highly multimodal Rastrigin-style g
    (reference `multi_objective.py:481`)."""

    _ref_val = 10000.0

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
            f = 1.0 + g
            for j in range(m - 1 - i):
                f = f * jnp.cos(0.5 * math.pi * X[..., j])
            if i > 0:
                f = f * jnp.sin(0.5 * math.pi * X[..., m - 1 - i])
            fs.append(f)
        return jnp.stack(fs, axis=-1)


class DTLZ4(DTLZ2):
    """DTLZ2 with position variables raised to alpha=100, biasing solutions
    toward the f_M-f_1 plane (reference `multi_objective.py:517`; note the
    reference's `_alpha` attribute is inert there — this implementation
    applies the exponent as the DTLZ paper specifies)."""

    _alpha = 100.0

    def evaluate_true(self, X):
        m = self.num_objectives
        Xpos = X[..., : m - 1] ** self._alpha
        X = jnp.concatenate([Xpos, X[..., m - 1 :]], axis=-1)
        return DTLZ2.evaluate_true(self, X)


class DTLZ5(DTLZ):
    """Degenerate-front DTLZ5 (reference `multi_objective.py:529`)."""

    _ref_val = 10.0

    def evaluate_true(self, X):
        m = self.num_objectives
        Xm = X[..., -self.k :]
        Xpos = X[..., : -self.k]
        g = jnp.sum(jnp.square(Xm - 0.5), axis=-1)
        gu = g[..., None]
        theta = 1.0 / (2.0 * (1.0 + gu)) * (1.0 + 2.0 * gu * Xpos)
        theta = jnp.concatenate([X[..., :1], theta[..., 1:]], axis=-1)
        fs = []
        t = theta.shape[-1]
        for i in range(m):
            f = 1.0 + g
            for j in range(t - i):
                f = f * jnp.cos(0.5 * math.pi * theta[..., j])
            if i > 0:
                f = f * jnp.sin(0.5 * math.pi * theta[..., t - i])
            fs.append(f)
        return jnp.stack(fs, axis=-1)


class DTLZ7(DTLZ):
    """Disconnected-front DTLZ7 (reference `multi_objective.py:562`)."""

    _ref_val = 15.0

    def evaluate_true(self, X):
        m = self.num_objectives
        f = X[..., : m - 1]
        g = 1.0 + 9.0 / self.k * jnp.sum(X[..., -self.k :], axis=-1)
        h = m - jnp.sum(
            f / (1.0 + g[..., None]) * (1.0 + jnp.sin(3.0 * math.pi * f)),
            axis=-1,
        )
        return jnp.concatenate([f, ((1.0 + g) * h)[..., None]], axis=-1)


class GMM(MultiObjectiveTestProblem):
    """Each objective is the negative of a 3-component Gaussian mixture
    density on [0,1]^2 (reference `multi_objective.py:593`, [Daulton2022])."""

    dim = 2
    _bounds = [(0.0, 1.0), (0.0, 1.0)]
    _optimal_value = float("nan")

    _POS = [
        [[0.2, 0.2], [0.8, 0.2], [0.5, 0.7]],
        [[0.07, 0.2], [0.4, 0.8], [0.85, 0.1]],
        [[0.08, 0.21], [0.45, 0.75], [0.86, 0.11]],
        [[0.09, 0.19], [0.44, 0.72], [0.89, 0.13]],
    ]
    _STD = [[0.20, 0.10, 0.10], [0.2, 0.1, 0.05], [0.2, 0.1, 0.07], [0.15, 0.07, 0.09]]
    _WEIGHTS = [[0.5, 0.7, 0.7], [0.5, 0.7, 0.7], [0.5, 0.7, 0.9], [0.5, 0.7, 0.9]]
    _REF = [-0.2338, -0.2211, -0.5180, -0.1866]

    def __init__(self, num_objectives: int = 2, **kw):
        if num_objectives not in (2, 3, 4):
            raise ValueError("GMM supports 2 to 4 objectives")
        self.num_objectives = num_objectives
        self._ref_point = self._REF[:num_objectives]
        super().__init__(**kw)
        self.pos = jnp.asarray(self._POS[:num_objectives], jnp.float32)
        self.var = jnp.square(jnp.asarray(self._STD[:num_objectives], jnp.float32))
        # reference scales each isotropic-Gaussian pdf by 2*pi*var*w so the
        # mixture value is sum_j w_j * exp(-r^2 / (2 var_j))
        self.weights = jnp.asarray(self._WEIGHTS[:num_objectives], jnp.float32)

    def evaluate_true(self, X):
        d2 = jnp.sum(
            jnp.square(X[..., None, None, :] - self.pos), axis=-1
        )  # (..., m, 3)
        comp = self.weights * jnp.exp(-0.5 * d2 / self.var)
        return -jnp.sum(comp, axis=-1)


class Penicillin(MultiObjectiveTestProblem):
    """Penicillin-production simulator, 7-d / 3 objectives
    (-yield, CO2, fermentation time), all minimized (reference
    `multi_objective.py:689`, [Liang2021]). The 2500-step Euler integration
    runs as one `lax.fori_loop` with per-sample active masks (the
    reference's in-place masked updates expressed functionally)."""

    dim = 7
    num_objectives = 3
    _bounds = [
        (60.0, 120.0),
        (0.05, 18.0),
        (293.0, 303.0),
        (0.05, 18.0),
        (0.01, 0.5),
        (500.0, 700.0),
        (5.0, 6.5),
    ]
    _ref_point = [1.85, 86.93, 514.70]
    _optimal_value = float("nan")

    Y_xs, Y_ps = 0.45, 0.90
    K_1, K_2 = 1e-10, 7e-5
    m_X = 0.014
    alpha_1, alpha_2, alpha_3 = 0.143, 4e-7, 1e-4
    mu_X, K_X = 0.092, 0.15
    mu_p, K_p, K_I = 0.005, 0.0002, 0.10
    K = 0.04
    k_g, E_g = 7.0e3, 5100.0
    k_d, E_d = 1e33, 50000.0
    lambd = 2.5e-4
    T_v, T_o = 273.0, 373.0
    R = 1.9872
    V_max = 180.0

    def evaluate_true(self, X):
        shape = X.shape[:-1]
        Xf = X.reshape(-1, self.dim).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        V0, X0, T, S0, F, s_f, H_ = (Xf[:, i] for i in range(7))
        H = jnp.power(10.0, -H_)
        cls = type(self)

        def body(t, carry):
            P, V, Xb, S, CO2, t_end, active = carry
            F_loss = V * cls.lambd * (
                jnp.exp(5.0 * ((T - cls.T_o) / (cls.T_v - cls.T_o))) - 1.0
            )
            dV = F - F_loss
            mu = (
                (cls.mu_X / (1.0 + cls.K_1 / H + H / cls.K_2))
                * (S / (cls.K_X * Xb + S))
                * (
                    cls.k_g * jnp.exp(-cls.E_g / (cls.R * T))
                    - cls.k_d * jnp.exp(-cls.E_d / (cls.R * T))
                )
            )
            dX = mu * Xb - (Xb / V) * dV
            mu_pp = cls.mu_p * (S / (cls.K_p + S + S**2 / cls.K_I))
            dS = (
                -(mu / cls.Y_xs) * Xb
                - (mu_pp / cls.Y_ps) * Xb
                - cls.m_X * Xb
                + F * s_f / V
                - (S / V) * dV
            )
            dP = mu_pp * Xb - cls.K * P - (P / V) * dV
            dCO2 = cls.alpha_1 * dX + cls.alpha_2 * Xb + cls.alpha_3

            P_n = jnp.where(active, P + dP, P)
            V_n = jnp.where(active, V + dV, V)
            X_n = jnp.where(active, Xb + dX, Xb)
            S_n = jnp.where(active, S + dS, S)
            CO2_n = jnp.where(active, CO2 + dCO2, CO2)
            stop = (V_n > cls.V_max) | (S_n < 0.0) | (jnp.where(active, dP, 1.0) < 1e-11)
            newly = active & stop
            t_end_n = jnp.where(newly, jnp.minimum(t_end, t.astype(t_end.dtype)), t_end)
            return (P_n, V_n, X_n, S_n, CO2_n, t_end_n, active & ~stop)

        P = jnp.zeros_like(V0)
        CO2 = jnp.zeros_like(V0)
        t_end = jnp.full_like(V0, 2500.0)
        active = jnp.ones_like(V0, dtype=bool)
        P, _, _, _, CO2, t_end, _ = jax.lax.fori_loop(
            1, 2501, body, (P, V0, X0, S0, CO2, t_end, active)
        )
        out = jnp.stack([-P, CO2, t_end], axis=-1)
        return out.reshape(*shape, 3).astype(X.dtype)


class ToyRobust(MultiObjectiveTestProblem):
    """1-d robust-MO toy problem (reference `multi_objective.py:823`,
    [Daulton2022]); both objectives returned negated as in the reference."""

    dim = 1
    _bounds = [(0.0, 0.7)]
    _ref_point = [-6.1397, -8.1942]
    num_objectives = 2
    _optimal_value = float("nan")

    def _f1(self, X):
        p1 = 2.4 - 10.0 * X - 0.1 * jnp.square(X)
        p2 = 2.0 * X - 0.1 * jnp.square(X)
        smoother = jnp.square(X - 0.5) + jnp.sin(30.0 * X) * 0.1
        x_mask = jax.nn.sigmoid((0.2 - X) / 0.005)
        return -(p1 * x_mask + p2 * (1.0 - x_mask) + smoother) * 30.0 + 30.0

    def _f2(self, X):
        from botorch_tpu.test_functions.synthetic import Levy
        from botorch_tpu.utils.transforms import unnormalize

        levy = Levy(dim=2)
        X2 = jnp.concatenate([X, jnp.zeros_like(X)], axis=-1)
        X2 = X2 * 0.95 + 0.03
        X2 = unnormalize(X2, levy.bounds)
        Y = levy.evaluate_true(X2)[..., None]
        return Y - jnp.square(X2[..., :1]) * 0.75

    def evaluate_true(self, X):
        return -jnp.concatenate([self._f1(X), self._f2(X)], axis=-1)


class CarSideImpact(MultiObjectiveTestProblem):
    """7-d, 4-objective car side-impact problem (reference
    `multi_objective.py:1094`, [Tanabe2020]); the 4th objective is the sum
    of constraint violations."""

    num_objectives = 4
    dim = 7
    _bounds = [
        (0.5, 1.5),
        (0.45, 1.35),
        (0.5, 1.5),
        (0.5, 1.5),
        (0.875, 2.625),
        (0.4, 1.2),
        (0.4, 1.2),
    ]
    _ref_point = [45.4872, 4.5114, 13.3394, 10.3942]
    _max_hv = 484.72654347642793
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        X1, X2, X3, X4, X5, X6, X7 = (X[..., i] for i in range(7))
        f1 = (
            1.98 + 4.9 * X1 + 6.67 * X2 + 6.98 * X3 + 4.01 * X4
            + 1.78 * X5 + 1e-5 * X6 + 2.73 * X7
        )
        f2 = 4.72 - 0.5 * X4 - 0.19 * X2 * X3
        V_MBP = 10.58 - 0.674 * X1 * X2 - 0.67275 * X2
        V_FD = 16.45 - 0.489 * X3 * X7 - 0.843 * X5 * X6
        f3 = 0.5 * (V_MBP + V_FD)
        g = jnp.stack(
            [
                1.0 - 1.16 + 0.3717 * X2 * X4 + 0.0092928 * X3,
                0.32 - 0.261 + 0.0159 * X1 * X2 + 0.06486 * X1
                + 0.019 * X2 * X7 - 0.0144 * X3 * X5 - 0.0154464 * X6,
                0.32 - 0.214 - 0.00817 * X5 + 0.045195 * X1 + 0.0135168 * X1
                - 0.03099 * X2 * X6 + 0.018 * X2 * X7 - 0.007176 * X3
                - 0.023232 * X3 + 0.00364 * X5 * X6 + 0.018 * jnp.square(X2),
                0.32 - 0.74 + 0.61 * X2 + 0.031296 * X3 + 0.031872 * X7
                - 0.227 * jnp.square(X2),
                32.0 - 28.98 - 3.818 * X3 + 4.2 * X1 * X2 - 1.27296 * X6
                + 2.68065 * X7,
                32.0 - 33.86 - 2.95 * X3 + 5.057 * X1 * X2 + 3.795 * X2
                + 3.4431 * X7 - 1.45728,
                32.0 - 46.36 + 9.9 * X2 + 4.4505 * X1,
                4.0 - f2,
                9.9 - V_MBP,
                15.7 - V_FD,
            ],
            axis=-1,
        )
        f4 = jnp.sum(jnp.where(g < 0, -g, 0.0), axis=-1)
        return jnp.stack([f1, f2, f3, f4], axis=-1)


# ----------------------- constrained MO problems --------------------------- #


class ConstrainedMOTestProblem(MultiObjectiveTestProblem):
    """MO problems with slack constraints (feasible iff all slacks >= 0),
    reference `test_functions/base.py` `ConstrainedBaseTestProblem`."""

    num_constraints: int

    def evaluate_slack(self, X: Array) -> Array:
        raise NotImplementedError

    def is_feasible(self, X: Array) -> Array:
        return jnp.all(self.evaluate_slack(X) >= 0, axis=-1)


class BNH(ConstrainedMOTestProblem):
    """Constrained BNH (reference `multi_objective.py:1183`)."""

    dim = 2
    num_objectives = 2
    num_constraints = 2
    _bounds = [(0.0, 5.0), (0.0, 3.0)]
    _ref_point = [0.0, 0.0]
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        return jnp.stack(
            [
                4.0 * jnp.sum(jnp.square(X), axis=-1),
                jnp.sum(jnp.square(X - 5.0), axis=-1),
            ],
            axis=-1,
        )

    def evaluate_slack(self, X):
        c1 = 25.0 - jnp.square(X[..., 0] - 5.0) - jnp.square(X[..., 1])
        c2 = jnp.square(X[..., 0] - 8.0) + jnp.square(X[..., 1] + 3.0) - 7.7
        return jnp.stack([c1, c2], axis=-1)


class CONSTR(ConstrainedMOTestProblem):
    """Constrained CONSTR (reference `multi_objective.py:1207`)."""

    dim = 2
    num_objectives = 2
    num_constraints = 2
    _bounds = [(0.1, 10.0), (0.0, 5.0)]
    _ref_point = [10.0, 10.0]
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        return jnp.stack(
            [X[..., 0], (1.0 + X[..., 1]) / X[..., 0]], axis=-1
        )

    def evaluate_slack(self, X):
        c1 = 9.0 * X[..., 0] + X[..., 1] - 6.0
        c2 = 9.0 * X[..., 0] - X[..., 1] - 1.0
        return jnp.stack([c1, c2], axis=-1)


class ConstrainedBraninCurrin(BraninCurrin, ConstrainedMOTestProblem):
    """BraninCurrin with the Gelbart disk constraint (reference
    `multi_objective.py:1231`)."""

    num_constraints = 1
    _ref_point = [80.0, 12.0]
    _max_hv = 608.4004237022673
    _con_bounds = [(-5.0, 10.0), (0.0, 15.0)]

    def evaluate_slack(self, X):
        lo = jnp.asarray([b[0] for b in self._con_bounds], X.dtype)
        hi = jnp.asarray([b[1] for b in self._con_bounds], X.dtype)
        Xt = lo + (hi - lo) * X
        return (
            50.0
            - jnp.square(Xt[..., 0:1] - 2.5)
            - jnp.square(Xt[..., 1:2] - 7.5)
        )


class C2DTLZ2(DTLZ2, ConstrainedMOTestProblem):
    """DTLZ2 with the C2 spherical-cap constraint (reference
    `multi_objective.py:1270`)."""

    num_constraints = 1
    _r = 0.2
    _max_hv = 0.3996406303723544

    def evaluate_slack(self, X):
        f = self.evaluate_true(X)
        m = f.shape[-1]
        term1 = jnp.square(f - 1.0)  # (..., m)
        sq = jnp.square(f)
        sum_sq = jnp.sum(sq, axis=-1, keepdims=True)
        # sum over j != i of (f_j^2 - r^2)
        term2 = (sum_sq - sq) - (m - 1) * self._r**2
        min1 = jnp.min(term1 + term2, axis=-1)
        min2 = jnp.sum(
            jnp.square(f - 1.0 / math.sqrt(m)) - self._r**2, axis=-1
        )
        return -jnp.minimum(min1, min2)[..., None]


class DiscBrake(ConstrainedMOTestProblem):
    """4-d, 2-objective, 4-constraint disc-brake design (reference
    `multi_objective.py:1296`, [Tanabe2020])."""

    dim = 4
    num_objectives = 2
    num_constraints = 4
    _bounds = [(55.0, 80.0), (75.0, 110.0), (1000.0, 3000.0), (11.0, 20.0)]
    _ref_point = [5.7771, 3.9651]
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        X1, X2, X3, X4 = (X[..., i] for i in range(4))
        sq = jnp.square(X2) - jnp.square(X1)
        f1 = 4.9e-5 * sq * (X4 - 1.0)
        f2 = 9.82e6 * sq / (X3 * X4 * (X2**3 - X1**3))
        return jnp.stack([f1, f2], axis=-1)

    def evaluate_slack(self, X):
        X1, X2, X3, X4 = (X[..., i] for i in range(4))
        sq = jnp.square(X2) - jnp.square(X1)
        cub = X2**3 - X1**3
        g1 = X2 - X1 - 20.0
        g2 = 0.4 - X3 / (3.14 * sq)
        g3 = 1.0 - (2.22e-3 * X3 * cub) / jnp.square(sq)
        g4 = (2.66e-2 * X3 * X4 * cub) / sq - 900.0
        return jnp.stack([g1, g2, g3, g4], axis=-1)


class MW7(ConstrainedMOTestProblem):
    """MW7 with a disconnected front (reference `multi_objective.py:1342`,
    [Ma2019])."""

    num_constraints = 2
    num_objectives = 2
    _ref_point = [1.2, 1.2]
    _optimal_value = float("nan")

    def __init__(self, dim: int = 2, **kw):
        if dim < 2:
            raise ValueError("dim must be >= 2")
        self.dim = dim
        self._bounds = [(0.0, 1.0)] * dim
        super().__init__(**kw)

    @staticmethod
    def _la2(A, B, C, D, theta):
        return A * jnp.sin(B * theta**C) ** D

    def evaluate_true(self, X):
        a = X[..., :-1] - 0.5
        contrib = 2.0 * jnp.square(X[..., 1:] + jnp.square(a) - 1.0)
        g = 1.0 + jnp.sum(contrib, axis=-1)
        f0 = g * X[..., 0]
        f1 = g * jnp.sqrt(jnp.maximum(1.0 - jnp.square(f0 / g), 0.0))
        return jnp.stack([f0, f1], axis=-1)

    def evaluate_slack(self, X):
        f = self.evaluate_true(X)
        f0, f1 = f[..., 0], f[..., 1]
        atan = jnp.arctan2(f1, f0)
        g0 = (
            jnp.square(f0)
            + jnp.square(f1)
            - jnp.square(1.2 + jnp.abs(self._la2(0.4, 4.0, 1.0, 16.0, atan)))
        )
        g1 = (
            jnp.square(1.15 - self._la2(0.2, 4.0, 1.0, 8.0, atan))
            - jnp.square(f0)
            - jnp.square(f1)
        )
        return -jnp.stack([g0, g1], axis=-1)


class OSY(ConstrainedMOTestProblem):
    """OSY problem (reference `multi_objective.py:1402`, [Oszycka1995])."""

    dim = 6
    num_constraints = 6
    num_objectives = 2
    _bounds = [
        (0.0, 10.0),
        (0.0, 10.0),
        (1.0, 5.0),
        (0.0, 6.0),
        (1.0, 5.0),
        (0.0, 10.0),
    ]
    _ref_point = [-75.0, 75.0]
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        f1 = -(
            25.0 * jnp.square(X[..., 0] - 2.0)
            + jnp.square(X[..., 1] - 2.0)
            + jnp.square(X[..., 2] - 1.0)
            + jnp.square(X[..., 3] - 4.0)
            + jnp.square(X[..., 4] - 1.0)
        )
        f2 = jnp.sum(jnp.square(X), axis=-1)
        return jnp.stack([f1, f2], axis=-1)

    def evaluate_slack(self, X):
        g1 = X[..., 0] + X[..., 1] - 2.0
        g2 = 6.0 - X[..., 0] - X[..., 1]
        g3 = 2.0 - X[..., 1] + X[..., 0]
        g4 = 2.0 - X[..., 0] + 3.0 * X[..., 1]
        g5 = 4.0 - jnp.square(X[..., 2] - 3.0) - X[..., 3]
        g6 = jnp.square(X[..., 4] - 3.0) + X[..., 5] - 4.0
        return jnp.stack([g1, g2, g3, g4, g5, g6], axis=-1)


class SRN(ConstrainedMOTestProblem):
    """Constrained SRN (reference `multi_objective.py:1444`)."""

    dim = 2
    num_objectives = 2
    num_constraints = 2
    _bounds = [(-20.0, 20.0), (-20.0, 20.0)]
    _ref_point = [0.0, 0.0]
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        obj1 = 2.0 + jnp.sum(jnp.square(X - 2.0), axis=-1)
        obj2 = 9.0 * X[..., 0] - jnp.square(X[..., 1] - 1.0)
        return jnp.stack([obj1, obj2], axis=-1)

    def evaluate_slack(self, X):
        c1 = 225.0 - jnp.sum(jnp.square(jnp.square(X)), axis=-1)
        c2 = -10.0 - X[..., 0] + 3.0 * X[..., 1]
        return jnp.stack([c1, c2], axis=-1)


class WeldedBeam(ConstrainedMOTestProblem):
    """Multi-objective welded-beam design (reference
    `multi_objective.py:1468`; pymoo variant of the SO problem).

    Note: like the reference, `evaluate_slack` returns the raw normalized
    g-values, which are negative when the engineering constraints hold —
    i.e. the sign is inverted relative to the slack>=0-feasible convention
    (a reference quirk kept for parity)."""

    dim = 4
    num_constraints = 4
    num_objectives = 2
    _bounds = [(0.125, 5.0), (0.1, 10.0), (0.1, 10.0), (0.125, 5.0)]
    _ref_point = [40.0, 0.015]
    _optimal_value = float("nan")

    def evaluate_true(self, X):
        x1, x2, x3, x4 = (X[..., i] for i in range(4))
        f1 = 1.10471 * jnp.square(x1) * x2 + 0.04811 * x3 * x4 * (14.0 + x2)
        f2 = 2.1952 / (x4 * x3**3)
        return jnp.stack([f1, f2], axis=-1)

    def evaluate_slack(self, X):
        x1, x2, x3, x4 = (X[..., i] for i in range(4))
        P, L, t_max, s_max = 6000.0, 14.0, 13600.0, 30000.0
        R = jnp.sqrt(0.25 * (jnp.square(x2) + jnp.square(x1 + x3)))
        M = P * (L + x2 / 2.0)
        J = (
            2.0
            * math.sqrt(0.5)
            * x1
            * x2
            * (jnp.square(x2) / 12.0 + 0.25 * jnp.square(x1 + x3))
        )
        t1 = P / (math.sqrt(2.0) * x1 * x2)
        t2 = M * R / J
        t = jnp.sqrt(jnp.square(t1) + t1 * t2 * x2 / R + jnp.square(t2))
        s = 6.0 * P * L / (x4 * jnp.square(x3))
        P_c = 64746.022 * (1.0 - 0.0282346 * x3) * x3 * x4**3
        g1 = (t - t_max) / t_max
        g2 = (s - s_max) / s_max
        g3 = (x1 - x4) / (5.0 - 0.125)
        g4 = (P - P_c) / P
        return jnp.stack([g1, g2, g3, g4], axis=-1)


# ------------------- multi-objective multi-fidelity ------------------------ #


class MOMFBraninCurrin(MultiObjectiveTestProblem):
    """Branin-Currin for MO-MF optimization; last input dim is the fidelity
    `s` (reference `multi_objective_multi_fidelity.py:25`, [Irshad2021]).
    Returned negated (maximization of the scaled objectives)."""

    dim = 3
    num_objectives = 2
    _bounds = [(0.0, 1.0)] * 3
    _ref_point = [0.0, 0.0]
    _max_hv = 0.5235514158034145
    _optimal_value = float("nan")

    def _branin(self, X):
        x1, x2, s = X[..., 0], X[..., 1], X[..., 2]
        x11 = 15.0 * x1 - 5.0
        x22 = 15.0 * x2
        b = 5.1 / (4.0 * math.pi**2) - 0.01 * (1.0 - s)
        c = 5.0 / math.pi - 0.1 * (1.0 - s)
        r = 6.0
        t = 1.0 / (8.0 * math.pi) + 0.05 * (1.0 - s)
        y = jnp.square(x22 - b * x11**2 + c * x11 - r) + 10.0 * (1.0 - t) * jnp.cos(x11) + 10.0
        return (21.0 - y) / 22.0

    def _currin(self, X):
        x1, x2, s = X[..., 0], X[..., 1], X[..., 2]
        A = 2300.0 * x1**3 + 1900.0 * x1**2 + 2092.0 * x1 + 60.0
        B = 100.0 * x1**3 + 500.0 * x1**2 + 4.0 * x1 + 20.0
        y = (1.0 - 0.1 * (1.0 - s) * jnp.exp(-1.0 / (2.0 * x2))) * A / B
        return (14.0 - y) / 15.0

    def evaluate_true(self, X):
        return jnp.stack([-self._branin(X), -self._currin(X)], axis=-1)


class MOMFPark(MultiObjectiveTestProblem):
    """Modified Park functions for MO-MF optimization; 4+1-d with fidelity
    `s` last (reference `multi_objective_multi_fidelity.py:91`,
    [Irshad2021])."""

    dim = 5
    num_objectives = 2
    _bounds = [(0.0, 1.0)] * 5
    _ref_point = [0.0, 0.0]
    _max_hv = 0.08551927363087991
    _optimal_value = float("nan")

    def _transform(self, X):
        x1, x2, x3, x4, s = (X[..., i] for i in range(5))
        return jnp.stack(
            [
                1.0 - 2.0 * jnp.square(x1 - 0.6),
                x2,
                1.0 - 3.0 * jnp.square(x3 - 0.5),
                1.0 - jnp.square(x4 - 0.8),
                s,
            ],
            axis=-1,
        )

    def evaluate_true(self, X):
        X = self._transform(X)
        x1, x2, x3, x4, s = (X[..., i] for i in range(5))
        A = 0.9 + 0.1 * s
        B = 0.1 * (1.0 - s)
        T1 = (
            (x1 + 1e-3 * (1.0 - s))
            / 2.0
            * jnp.sqrt(1.0 + (x2 + jnp.square(x3)) * x4 / (jnp.square(x1) + 1e-4))
        )
        T2 = (x1 + 3.0 * x4) * jnp.exp(1.0 + jnp.sin(x3))
        park1 = A * (T1 + T2 - B) / 22.0 - 0.8
        park2 = A * (5.0 - 2.0 / 3.0 * jnp.exp(x1 + x2) + x4 * jnp.sin(x3) * A - x3 + B) / 4.0 - 0.7
        return jnp.stack([-park1, -park2], axis=-1)


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
    for cls in [
        BraninCurrin, ZDT1, ZDT2, ZDT3,
        DTLZ1, DTLZ2, DTLZ3, DTLZ4, DTLZ5, DTLZ7,
        GMM, Penicillin, ToyRobust, CarSideImpact, VehicleSafety,
        BNH, CONSTR, ConstrainedBraninCurrin, C2DTLZ2, DiscBrake,
        MW7, OSY, SRN, WeldedBeam,
        MOMFBraninCurrin, MOMFPark,
    ]
}


# --------------------------------------------------------------------------- #
# DH problems for robust multi-objective optimization ([Deb2005robust];
# reference `multi_objective.py:154-330`)
# --------------------------------------------------------------------------- #
class DH(MultiObjectiveTestProblem):
    """Base for the DH robust-MO family (2 objectives, minimization;
    reference `multi_objective.py:154`)."""

    num_objectives = 2
    _ref_point = [1.1, 1.1]
    _optimal_value = float("nan")
    _x_1_lb: float
    _area_under_curve: float
    _min_dim: int

    def __init__(self, dim: int, noise_std: float = 0.0, negate: bool = False):
        if dim < self._min_dim:
            raise ValueError(f"dim must be >= {self._min_dim}, got {dim}")
        self.dim = dim
        self._bounds = [(0.0, 1.0), (self._x_1_lb, 1.0)] + [
            (-1.0, 1.0) for _ in range(dim - 2)
        ]
        self._max_hv = (
            self._ref_point[0] * self._ref_point[1] - self._area_under_curve
        )
        super().__init__(noise_std=noise_std, negate=negate)


class DH1(DH):
    """`f_0 = x_0`, `f_1 = (1 - x_0^2) + g(x) S(x_0)` with Rastrigin-style
    `g` and `S = alpha/(0.2 + x_0) + beta x_0^2` (reference
    `multi_objective.py:213`). Pareto front `f_1 = 1 - f_0^2`."""

    alpha = 1.0
    beta = 1.0
    _x_1_lb = -1.0
    _area_under_curve = 2.0 / 3.0
    _min_dim = 2

    def _h(self, X):
        return 1.0 - jnp.square(X[..., 0])

    def _g(self, X):
        xt = X[..., 1:]
        return jnp.sum(
            10.0 + jnp.square(xt) - 10.0 * jnp.cos(4 * math.pi * xt), axis=-1
        )

    def _S(self, X):
        x0 = X[..., 0]
        return self.alpha / (0.2 + x0) + self.beta * jnp.square(x0)

    def evaluate_true(self, X):
        f0 = X[..., 0]
        gs = self._g(X) * self._S(X)
        f1 = self._h(X) + jnp.nan_to_num(gs)
        return jnp.stack([f0, f1], axis=-1)


class DH2(DH1):
    """DH1 with `beta = 10` (reference `multi_objective.py:257`)."""

    beta = 10.0


class DH3(DH):
    """`f_1 = h(x_1) (g + S)` with a bimodal `h` (local front at
    `x_1 = 0.35`, global at `x_1 = 0.85`; reference
    `multi_objective.py:266`)."""

    _x_1_lb = 0.0
    _area_under_curve = 0.328449169794718
    _min_dim = 3

    @staticmethod
    def _exp_args(x):
        return (
            -jnp.square((x - 0.35) / 0.25),
            -jnp.square((x - 0.85) / 0.03),
        )

    def _h(self, X):
        e1, e2 = self._exp_args(X[..., 1])
        return 2.0 - 0.8 * jnp.exp(e1) - jnp.exp(e2)

    def _g(self, X):
        return 50.0 * jnp.sum(jnp.square(X[..., 2:]), axis=-1)

    def _S(self, X):
        return 1.0 - jnp.sqrt(X[..., 0])

    def evaluate_true(self, X):
        f0 = X[..., 0]
        f1 = self._h(X) * (self._g(X) + self._S(X))
        return jnp.stack([f0, f1], axis=-1)


class DH4(DH3):
    """DH3 with `h` over `x_0 + x_1` and bounds `[0,1] x [-0.15,1] x
    [-1,1]^{d-2}` (reference `multi_objective.py:310`)."""

    _x_1_lb = -0.15
    _area_under_curve = 0.22845

    def _h(self, X):
        e1, e2 = self._exp_args(jnp.sum(X[..., :2], axis=-1))
        return 2.0 - X[..., 0] - 0.8 * jnp.exp(e1) - jnp.exp(e2)
