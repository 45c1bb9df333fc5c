"""Value anchors for the extended test-problem suite (reference
`test/test_functions/`): known fronts, optima, and feasibility at
analytically-known points."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from botorch_tpu.test_functions.extra import (
    AugmentedRosenbrock,
    SpeedReducer,
)
from botorch_tpu.test_functions.multi_objective import (
    BNH,
    C2DTLZ2,
    CONSTR,
    DTLZ2,
    DTLZ3,
    DTLZ4,
    DTLZ5,
    DTLZ7,
    GMM,
    MW7,
    OSY,
    SRN,
    CarSideImpact,
    ConstrainedBraninCurrin,
    DiscBrake,
    MOMFBraninCurrin,
    MOMFPark,
    Penicillin,
    ToyRobust,
    WeldedBeam,
)


def test_dtlz_fronts_on_unit_sphere():
    # at X_m = 0.5 the g terms vanish for DTLZ2/3/4 -> front on unit sphere
    for cls in (DTLZ2, DTLZ3, DTLZ4):
        prob = cls(dim=6, num_objectives=3)
        X = jnp.full((4, 6), 0.5)
        X = X.at[:, 0].set(jnp.asarray([0.0, 0.3, 0.7, 1.0]))
        X = X.at[:, 1].set(jnp.asarray([0.2, 0.5, 0.8, 1.0]))
        Y = np.asarray(prob(X))
        np.testing.assert_allclose(
            np.sum(Y**2, axis=-1), 1.0, atol=1e-5, err_msg=cls.__name__
        )


def test_dtlz5_degenerate_front():
    prob = DTLZ5(dim=6, num_objectives=3)
    X = jnp.full((3, 6), 0.5)
    X = X.at[:, 0].set(jnp.asarray([0.1, 0.5, 0.9]))
    Y = np.asarray(prob(X))
    # front also lies on the unit sphere (g = 0)
    np.testing.assert_allclose(np.sum(Y**2, axis=-1), 1.0, atol=1e-5)


def test_dtlz7_last_objective_formula():
    prob = DTLZ7(dim=6, num_objectives=3)
    X = jnp.asarray(np.random.default_rng(0).uniform(size=(5, 6)), jnp.float32)
    X = X.at[:, -prob.k :].set(0.0)  # X_m = 0 -> g = 1
    Y = np.asarray(prob(X))
    f = Y[:, :2]
    h = 3 - np.sum(f / 2.0 * (1 + np.sin(3 * math.pi * f)), axis=-1)
    np.testing.assert_allclose(Y[:, 2], 2.0 * h, atol=1e-5)


def test_dtlz4_biases_toward_axes():
    # x0 = 0.9 with alpha = 100 -> x0^alpha ~ 0 -> f0 ~ 1+g, f1 ~ 0
    prob = DTLZ4(dim=4, num_objectives=2)
    X = jnp.full((1, 4), 0.5).at[0, 0].set(0.9)
    Y = np.asarray(prob(X))[0]
    assert Y[0] > 0.99 and Y[1] < 0.05


def test_gmm_peaks():
    prob = GMM(num_objectives=2)
    # first objective's strongest mixture component peaks at (0.5, 0.7)
    Y_peak = np.asarray(prob(jnp.asarray([[0.5, 0.7]])))[0, 0]
    Y_off = np.asarray(prob(jnp.asarray([[0.95, 0.95]])))[0, 0]
    assert Y_peak < Y_off  # minimization: peak has the lower (-density)
    p3 = GMM(num_objectives=3)
    assert p3(jnp.zeros((2, 2))).shape == (2, 3)


def test_penicillin_shapes_and_time_bounds():
    prob = Penicillin()
    X = jnp.asarray(
        [[100.0, 10.0, 298.0, 10.0, 0.1, 600.0, 6.0],
         [70.0, 2.0, 295.0, 3.0, 0.05, 550.0, 5.5]]
    )
    Y = np.asarray(prob(X))
    assert Y.shape == (2, 3)
    assert (Y[:, 2] >= 1).all() and (Y[:, 2] <= 2500).all()
    assert (Y[:, 0] <= 0).all()  # -yield
    assert (Y[:, 1] >= 0).all()  # CO2


def test_constrained_mo_feasibility_points():
    # BNH: (2, 1) is feasible; (5, 3) violates c1
    bnh = BNH()
    assert bool(bnh.is_feasible(jnp.asarray([[2.0, 1.0]]))[0])
    assert not bool(bnh.is_feasible(jnp.asarray([[0.0, 3.0]]))[0])
    # CONSTR: x=(1, 1) feasible (9+1-6>0, 9-1-1>0)
    assert bool(CONSTR().is_feasible(jnp.asarray([[1.0, 1.0]]))[0])
    # SRN: origin fails c2 (-10 < 0); (0, 3.5) satisfies both
    # (0 + 3.5^4 = 150.06 <= 225 and -10 + 10.5 > 0)
    srn = SRN()
    assert not bool(srn.is_feasible(jnp.asarray([[0.0, 0.0]]))[0])
    assert bool(srn.is_feasible(jnp.asarray([[0.0, 3.5]]))[0])
    # OSY: known feasible point
    assert bool(OSY().is_feasible(jnp.asarray([[5.0, 1.0, 2.0, 0.0, 5.0, 5.0]]))[0])
    # disk constraint: center of domain is inside the disk
    cbc = ConstrainedBraninCurrin()
    assert bool(cbc.is_feasible(jnp.asarray([[0.5, 0.5]]))[0])
    # C2DTLZ2: points on the front near axes are feasible
    c2 = C2DTLZ2(dim=4, num_objectives=2)
    X_axis = jnp.zeros((1, 4)).at[:, 1:].set(0.5)  # f = (1, 0)
    assert bool(c2.is_feasible(X_axis)[0])
    # WeldedBeam: the reference returns raw g-values (negative when the
    # engineering constraints hold) — assert reference-faithful signs
    wb = WeldedBeam()
    assert bool((wb.evaluate_slack(jnp.asarray([[2.0, 4.0, 9.0, 4.0]])) < 0).all())
    # DiscBrake: constraint shapes
    db = DiscBrake()
    assert db.evaluate_slack(jnp.asarray([[60.0, 90.0, 2000.0, 15.0]])).shape == (1, 4)
    # MW7 constraint shapes
    mw = MW7(dim=3)
    assert mw.evaluate_slack(jnp.asarray([[0.3, 0.5, 0.5]])).shape == (1, 2)


def test_speed_reducer_known_optimum():
    prob = SpeedReducer()
    x_star = jnp.asarray(
        [[3.5, 0.7, 17.0, 7.3, 7.8, 3.350215, 5.286683]]
    )
    val = float(prob(x_star)[0])
    assert abs(val - 2996.3482) / 2996.3482 < 1e-3
    # g5/g6/g8/g11 are active at the optimum; nudge into the interior
    x_int = jnp.asarray([[3.51, 0.7, 17.0, 7.3, 7.8, 3.36, 5.29]])
    assert bool(prob.is_feasible(x_int)[0])


def test_augmented_rosenbrock_optimum():
    prob = AugmentedRosenbrock(dim=4)
    X = jnp.ones((1, 4))
    np.testing.assert_allclose(float(prob(X)[0]), 0.0, atol=1e-6)
    assert float(prob(jnp.ones((1, 4)).at[0, 0].set(2.0))[0]) > 0.0


def test_momf_full_fidelity_anchors():
    # At s=1 MOMFBraninCurrin reduces to the scaled Branin/Currin
    prob = MOMFBraninCurrin()
    X = jnp.asarray([[0.5, 0.6, 1.0]])
    Y = np.asarray(prob(X))[0]
    # hand-computed scaled values
    x11, x22 = 15 * 0.5 - 5, 15 * 0.6
    b, c = 5.1 / (4 * math.pi**2), 5 / math.pi
    t = 1 / (8 * math.pi)
    branin = (x22 - b * x11**2 + c * x11 - 6) ** 2 + 10 * (1 - t) * math.cos(x11) + 10
    np.testing.assert_allclose(Y[0], -(21 - branin) / 22, rtol=1e-5)
    park = MOMFPark()
    assert park(jnp.full((3, 5), 0.5)).shape == (3, 2)


def test_toy_robust_anchor():
    prob = ToyRobust()
    Y = np.asarray(prob(jnp.asarray([[0.1], [0.5]])))
    assert Y.shape == (2, 2)
    assert np.isfinite(Y).all()


def test_car_side_impact_violation_objective():
    prob = CarSideImpact()
    Y = np.asarray(prob(jnp.asarray([[1.0, 1.0, 1.0, 1.0, 1.5, 0.8, 0.8]])))
    assert Y.shape == (1, 4)
    assert Y[0, 3] >= 0  # violation sum is nonnegative


def test_dh_family_pareto_relations():
    from botorch_tpu.test_functions.multi_objective import DH1, DH2, DH3, DH4

    x0 = np.linspace(0.01, 1, 5)
    X = np.zeros((5, 4))
    X[:, 0] = x0
    for cls in (DH1, DH2):
        p = cls(dim=4)
        F = np.asarray(p.evaluate_true(jnp.asarray(X)))
        # on the Pareto set (x_i = 0, i > 0): f_0 = x_0, f_1 = 1 - x_0^2
        np.testing.assert_allclose(F[:, 0], x0, rtol=1e-6)
        np.testing.assert_allclose(F[:, 1], 1 - x0**2, atol=1e-6)
    # DH2 is harsher off the front than DH1 (beta 10 vs 1)
    Xoff = np.full((1, 4), 0.5)
    f1_dh1 = float(DH1(dim=4).evaluate_true(jnp.asarray(Xoff))[0, 1])
    f1_dh2 = float(DH2(dim=4).evaluate_true(jnp.asarray(Xoff))[0, 1])
    assert f1_dh2 > f1_dh1
    # DH3/DH4 global fronts approximately f_1 = 1 - sqrt(f_0)
    X3 = np.zeros((5, 5))
    X3[:, 0] = x0
    X3[:, 1] = 0.85
    F3 = np.asarray(DH3(dim=5).evaluate_true(jnp.asarray(X3)))
    np.testing.assert_allclose(F3[:, 1], 1 - np.sqrt(x0), atol=0.05)
    p4 = DH4(dim=5)
    assert p4.bounds[0, 1] == -0.15
    # max_hv follows the ref-box-minus-curve-area identity
    np.testing.assert_allclose(DH1(dim=4).max_hv, 1.21 - 2.0 / 3.0, rtol=1e-6)
    # dim floor enforcement
    try:
        DH3(dim=2)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_constrained_gramacy_and_hartmann():
    from botorch_tpu.test_functions.extra import (
        ConstrainedGramacy,
        ConstrainedHartmann,
        ConstrainedHartmannSmooth,
    )
    from botorch_tpu.test_functions.synthetic import Hartmann

    cg = ConstrainedGramacy()
    xopt = jnp.asarray([[0.1954, 0.4044]])
    np.testing.assert_allclose(
        float(cg.evaluate_true(xopt)[0]), cg._optimal_value, rtol=1e-3
    )
    assert bool(cg.is_feasible(xopt)[0])
    # interior point of the sin constraint is infeasible
    assert not bool(cg.is_feasible(jnp.asarray([[0.0, 0.0]]))[0])

    X6 = jnp.full((1, 6), 0.3)
    ch = ConstrainedHartmann(dim=6)
    np.testing.assert_allclose(
        float(ch.evaluate_true(X6)[0]),
        float(Hartmann(dim=6).evaluate_true(X6)[0]),
        rtol=1e-6,
    )
    # ||x|| = 0.99 -> slack 0.01 ; ||x||^2 = 1 -> smooth slack 0
    np.testing.assert_allclose(
        float(ch.evaluate_slack(jnp.asarray([[0.99, 0, 0, 0, 0, 0]]))[0, 0]),
        0.01,
        atol=1e-6,
    )
    chs = ConstrainedHartmannSmooth(dim=6)
    np.testing.assert_allclose(
        float(chs.evaluate_slack(jnp.ones((1, 6)) / np.sqrt(6.0))[0, 0]),
        0.0,
        atol=1e-5,
    )
