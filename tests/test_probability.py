"""Golden tests for stable normal special functions vs scipy float64
(reference: `botorch/utils/probability/utils.py`,
`acquisition/analytic.py:975` `_log_ei_helper`)."""

import jax
import numpy as np
import jax.numpy as jnp
import scipy.special as sps
import scipy.stats as sst

from botorch_tpu.utils import probability as pr


def test_erfcx_vs_scipy():
    x = jnp.asarray(np.linspace(-3, 30, 200), jnp.float32)
    got = np.asarray(pr.erfcx(x), np.float64)
    expect = sps.erfcx(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, expect, rtol=3e-5)


def test_log_ndtr_vs_scipy():
    x = jnp.asarray(np.linspace(-30, 8, 100), jnp.float32)
    got = np.asarray(pr.log_ndtr(x), np.float64)
    expect = sst.norm.logcdf(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_log_erfc_vs_scipy():
    x = jnp.asarray(np.linspace(-5, 15, 80), jnp.float32)
    got = np.asarray(pr.log_erfc(x), np.float64)
    expect = np.log(sps.erfc(np.asarray(x, np.float64)))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_log_ei_helper_vs_float64_reference():
    u = np.linspace(-12, 6, 200)
    phi = sst.norm.pdf(u)
    Phi = sst.norm.cdf(u)
    expect = np.log(phi + u * Phi)
    got = np.asarray(pr.log_ei_helper(jnp.asarray(u, jnp.float32)), np.float64)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)


def test_log_ei_helper_tail_is_finite_with_grad():
    import jax

    for v in [-50.0, -1e2, -1e4, -1e8]:
        val = float(pr.log_ei_helper(jnp.asarray(v)))
        g = float(jax.grad(lambda x: pr.log_ei_helper(x))(jnp.asarray(v)))
        assert np.isfinite(val)
        assert np.isfinite(g) and g > 0  # increasing in u


def test_log_prob_normal_in():
    a, b = -1.0, 2.0
    got = float(pr.log_prob_normal_in(jnp.asarray(a), jnp.asarray(b)))
    expect = np.log(sst.norm.cdf(b) - sst.norm.cdf(a))
    assert abs(got - expect) < 3e-4  # TPU f32 erf/log rounding
    # deep tail
    got = float(pr.log_prob_normal_in(jnp.asarray(-20.0), jnp.asarray(-18.0)))
    expect = sst.norm.logcdf(-18.0) + np.log1p(
        -np.exp(sst.norm.logcdf(-20.0) - sst.norm.logcdf(-18.0))
    )
    assert abs(got - expect) / abs(expect) < 1e-3


class TestMVNXPB:
    """Bivariate-conditioning MVN box probabilities (`utils/mvnxpb.py`)."""

    def test_exact_cases(self):
        from scipy import stats

        from botorch_tpu.utils.mvnxpb import mvnxpb

        rng = np.random.default_rng(3)
        # d = 2 is exact (a single bivariate rectangle)
        for _ in range(4):
            A = rng.normal(size=(2, 4))
            S = A @ A.T / 4
            a = rng.uniform(-2, 0, 2) * np.sqrt(np.diag(S))
            b = a + rng.uniform(0.5, 3, 2) * np.sqrt(np.diag(S))
            p = float(jnp.exp(mvnxpb(
                jnp.asarray(S, jnp.float32),
                jnp.asarray(np.stack([a, b], -1), jnp.float32),
            )))
            ref = stats.multivariate_normal(np.zeros(2), S).cdf(
                b, lower_limit=a
            )
            assert abs(p - ref) < 2e-5

    def test_matches_scipy_moderate_correlation(self):
        from scipy import stats

        from botorch_tpu.utils.mvnxpb import mvnxpb

        rng = np.random.default_rng(0)
        for d in [3, 5, 8]:
            for _ in range(3):
                A = rng.normal(size=(d, 4 * d))
                S = A @ A.T / (4 * d)
                a = rng.uniform(-2.5, 0, d) * np.sqrt(np.diag(S))
                b = a + rng.uniform(0.5, 3.5, d) * np.sqrt(np.diag(S))
                p = float(jnp.exp(mvnxpb(
                    jnp.asarray(S, jnp.float32),
                    jnp.asarray(np.stack([a, b], -1), jnp.float32),
                )))
                ref = stats.multivariate_normal(np.zeros(d), S).cdf(
                    b, lower_limit=a
                )
                # intrinsic approximation error of bivariate conditioning
                assert abs(p - ref) / max(ref, 1e-8) < 0.12

    def test_parity_with_reference_algorithm(self):
        """Values computed by running the reference MVNXPB solver
        (`botorch/utils/probability/mvnxpb.py:59`, float64) on the same
        inputs; ours (f32) agrees to ~5 significant digits where the
        pivot order coincides."""
        from botorch_tpu.utils.mvnxpb import mvnxpb

        rng = np.random.default_rng(0)
        expected = {  # (d, trial) -> reference solver output
            (3, 1): 3.505497e-01,
            (4, 0): 2.119818e-01,
            (5, 3): 2.139330e-01,
            (6, 0): 4.487865e-13,
            (10, 1): 4.174943e-06,
        }
        for d in [2, 3, 4, 5, 6, 8, 10]:
            for trial in range(4):
                A = rng.normal(size=(d, d + 2))
                S = A @ A.T / (d + 2)
                a = rng.uniform(-2.5, 0, d) * np.sqrt(np.diag(S))
                b = a + rng.uniform(0.5, 3.5, d) * np.sqrt(np.diag(S))
                if (d, trial) not in expected:
                    continue
                p = float(jnp.exp(mvnxpb(
                    jnp.asarray(S, jnp.float32),
                    jnp.asarray(np.stack([a, b], -1), jnp.float32),
                )))
                ref = expected[(d, trial)]
                assert abs(p - ref) / ref < 5e-3, (d, trial, p, ref)

    def test_infinite_bounds_and_gradients(self):
        from scipy import stats

        from botorch_tpu.utils.mvnxpb import mvnxpb

        rng = np.random.default_rng(1)
        d = 4
        A = rng.normal(size=(d, 3 * d))
        S = A @ A.T / (3 * d)
        ub = rng.uniform(-0.5, 1.5, d) * np.sqrt(np.diag(S))
        bounds = jnp.asarray(
            np.stack([np.full(d, -np.inf), ub], -1), jnp.float32
        )
        S32 = jnp.asarray(S, jnp.float32)
        p = float(jnp.exp(mvnxpb(S32, bounds)))
        ref = stats.multivariate_normal(np.zeros(d), S).cdf(ub)
        assert abs(p - ref) / ref < 0.05
        g = jax.grad(mvnxpb)(S32, bounds)
        assert np.isfinite(np.asarray(g)).all()
        gb = jax.grad(lambda bb: mvnxpb(S32, bb))(bounds)
        assert np.isfinite(np.asarray(gb)).all()
        # finite differences on an upper bound
        t = 1e-3
        fd = (
            float(mvnxpb(S32, bounds.at[1, 1].add(t)))
            - float(mvnxpb(S32, bounds.at[1, 1].add(-t)))
        ) / (2 * t)
        assert abs(fd - float(gb[1, 1])) < 5e-3

    def test_vmap_and_jit(self):
        from botorch_tpu.utils.mvnxpb import mvnxpb

        rng = np.random.default_rng(2)
        d = 5
        Ss, bs = [], []
        for _ in range(4):
            A = rng.normal(size=(d, 3 * d))
            S = A @ A.T / (3 * d)
            a = rng.uniform(-2, 0, d)
            bs.append(np.stack([a, a + 2], -1))
            Ss.append(S)
        Ss = jnp.asarray(np.stack(Ss), jnp.float32)
        bs = jnp.asarray(np.stack(bs), jnp.float32)
        batched = jax.jit(jax.vmap(mvnxpb))(Ss, bs)
        single = [float(mvnxpb(Ss[i], bs[i])) for i in range(4)]
        np.testing.assert_allclose(np.asarray(batched), single, rtol=1e-5)


class TestTruncatedMVNAndUSN:
    """`utils/truncated_mvn.py` vs closed forms and rejection sampling
    (reference: `utils/probability/truncated_multivariate_normal.py:21`,
    `unified_skew_normal.py:28`)."""

    def test_tmvn_density_normalizes_and_samples(self):
        from botorch_tpu.utils.truncated_mvn import (
            TruncatedMultivariateNormal,
        )

        rng = np.random.default_rng(0)
        d = 2
        A = rng.normal(size=(d, 6))
        S = A @ A.T / 6
        mean = rng.normal(size=d)
        lb = mean + rng.uniform(-2, -0.5, d) * np.sqrt(np.diag(S))
        ub = mean + rng.uniform(0.5, 2, d) * np.sqrt(np.diag(S))
        tm = TruncatedMultivariateNormal(
            jnp.asarray(mean, jnp.float32), jnp.asarray(S, jnp.float32),
            jnp.asarray(np.stack([lb, ub], -1), jnp.float32),
        )
        xs = np.linspace(lb[0], ub[0], 150)
        ys = np.linspace(lb[1], ub[1], 150)
        XX, YY = np.meshgrid(xs, ys)
        pts = jnp.asarray(np.stack([XX.ravel(), YY.ravel()], -1), jnp.float32)
        integ = float(jnp.sum(jnp.exp(jax.vmap(tm.log_prob)(pts))))
        integ *= (xs[1] - xs[0]) * (ys[1] - ys[0])
        assert abs(integ - 1.0) < 0.02
        samp = np.asarray(
            tm.rsample(jax.random.PRNGKey(0), num_samples=2000, thinning=4,
                       burnin=64)
        )
        raw = rng.multivariate_normal(mean, S, size=100000)
        keep = raw[np.all((raw >= lb) & (raw <= ub), axis=1)]
        assert np.abs(samp.mean(0) - keep.mean(0)).max() < 0.05
        assert np.abs(samp.std(0) - keep.std(0)).max() < 0.05

    def test_usn_1d_exact_density(self):
        from scipy import stats

        from botorch_tpu.utils.truncated_mvn import (
            TruncatedMultivariateNormal,
            UnifiedSkewNormal,
        )

        r = 0.7
        tm = TruncatedMultivariateNormal(
            jnp.zeros(1), jnp.ones((1, 1)),
            jnp.asarray([[0.3, 1.8]], jnp.float32),
        )
        usn = UnifiedSkewNormal(
            trunc=tm, gauss_mean=jnp.zeros(1), gauss_cov=jnp.ones((1, 1)),
            cross_covariance=jnp.asarray([[r]], jnp.float32),
        )
        xs = np.linspace(-5, 5, 401)
        f = np.exp(np.asarray(
            usn.log_prob(jnp.asarray(xs[:, None], jnp.float32)), np.float64
        ))
        s = np.sqrt(1 - r**2)
        num = stats.norm.cdf((1.8 - r * xs) / s) - stats.norm.cdf(
            (0.3 - r * xs) / s
        )
        den = stats.norm.cdf(1.8) - stats.norm.cdf(0.3)
        exact = stats.norm.pdf(xs) * num / den
        assert np.abs(f - exact).max() < 3e-4  # TPU f32 erf rounding
        assert abs(np.trapezoid(f, xs) - 1.0) < 1e-3
        g = jax.grad(lambda x: usn.log_prob(x[None])[0])(
            jnp.asarray([0.5], jnp.float32)
        )
        assert np.isfinite(np.asarray(g)).all()

    def test_usn_multidim_sampling_matches_rejection(self):
        from botorch_tpu.utils.truncated_mvn import (
            TruncatedMultivariateNormal,
            UnifiedSkewNormal,
        )

        rng = np.random.default_rng(0)
        dz, dx = 2, 2
        J = rng.normal(size=(dz + dx, 2 * (dz + dx)))
        K = J @ J.T / (2 * (dz + dx))
        Kzz, Kzx, Kxx = K[:dz, :dz], K[:dz, dz:], K[dz:, dz:]
        lb = -0.2 * np.sqrt(np.diag(Kzz))
        ub = 1.5 * np.sqrt(np.diag(Kzz))
        tm = TruncatedMultivariateNormal(
            jnp.zeros(dz), jnp.asarray(Kzz, jnp.float32),
            jnp.asarray(np.stack([lb, ub], -1), jnp.float32),
        )
        usn = UnifiedSkewNormal(
            trunc=tm, gauss_mean=jnp.zeros(dx),
            gauss_cov=jnp.asarray(Kxx, jnp.float32),
            cross_covariance=jnp.asarray(Kzx, jnp.float32),
        )
        su = np.asarray(
            usn.rsample(jax.random.PRNGKey(2), num_samples=4000, thinning=4,
                        burnin=64)
        )
        raw = rng.multivariate_normal(np.zeros(dz + dx), K, size=200000)
        keep = raw[
            np.all((raw[:, :dz] >= lb) & (raw[:, :dz] <= ub), axis=1)
        ][:, dz:]
        assert np.abs(su.mean(0) - keep.mean(0)).max() < 0.05
        assert np.abs(np.cov(su.T) - np.cov(keep.T)).max() < 0.05
        # density normalizes on a grid
        xs = np.linspace(-4, 4, 100)
        XX, YY = np.meshgrid(xs, xs)
        pts = jnp.asarray(np.stack([XX.ravel(), YY.ravel()], -1), jnp.float32)
        integ = float(jnp.sum(jnp.exp(usn.log_prob(pts)))) * (xs[1] - xs[0]) ** 2
        assert abs(integ - 1.0) < 0.02
