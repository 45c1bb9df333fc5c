"""Tests for the auxiliary subsystems (SURVEY §5): checkpoint/resume,
settings flags, logging, and diagnostics (phase timers / fit reports)."""

import logging as _pylogging

import jax
import jax.numpy as jnp
import numpy as np

from botorch_tpu.fit import fit_gp
from botorch_tpu.models.gp import make_gp


def test_checkpoint_roundtrip_model(tmp_path):
    from botorch_tpu import checkpoint

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (10, 2))
    Y = jnp.sin(3 * X[:, :1])
    m = fit_gp(make_gp(X, Y), jax.random.PRNGKey(1), num_restarts=2)

    path = str(tmp_path / "model.msgpack")
    checkpoint.save(path, m)
    template = make_gp(X, Y)  # same structure, fresh params
    m2 = checkpoint.load(path, template)

    # hyperparameters restored exactly; posterior identical
    assert np.allclose(
        np.asarray(m.params.raw_lengthscale),
        np.asarray(m2.params.raw_lengthscale),
    )
    p1 = m.posterior(X[:3])
    p2 = m2.posterior(X[:3])
    assert np.allclose(np.asarray(p1.mean), np.asarray(p2.mean))


def test_checkpoint_atomic_overwrite(tmp_path):
    from botorch_tpu import checkpoint

    path = str(tmp_path / "state.msgpack")
    tree = {"a": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    checkpoint.save(path, tree)
    tree2 = {"a": jnp.arange(4.0) * 2, "b": jnp.zeros((2, 2))}
    checkpoint.save(path, tree2)  # overwrite via os.replace
    out = checkpoint.load(path, tree)
    assert np.allclose(np.asarray(out["a"]), np.arange(4.0) * 2)
    assert np.allclose(np.asarray(out["b"]), 0.0)


def test_history_roundtrip(tmp_path):
    from botorch_tpu import checkpoint

    X = np.random.default_rng(0).uniform(size=(7, 3)).astype(np.float32)
    Y = np.sin(X.sum(-1)).astype(np.float32)
    path = str(tmp_path / "hist.npz")
    checkpoint.save_history(path, X, Y)
    X2, Y2 = checkpoint.load_history(path)
    assert np.allclose(X, X2) and np.allclose(Y, Y2)


def test_settings_flags_nest_and_restore():
    from botorch_tpu import settings

    assert settings.validate_input_scaling.on()
    with settings.validate_input_scaling(False):
        assert settings.validate_input_scaling.off()
        with settings.validate_input_scaling(True):
            assert settings.validate_input_scaling.on()
        assert settings.validate_input_scaling.off()
    assert settings.validate_input_scaling.on()

    assert settings.debug.off()
    with settings.debug():
        assert settings.debug.on()
    assert settings.debug.off()


def test_validate_input_scaling_gates_warning():
    import warnings

    from botorch_tpu import settings

    X_bad = jnp.asarray([[5.0, -3.0], [8.0, 11.0], [7.0, 2.0]])
    Y = jnp.ones((3, 1))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_gp(X_bad, Y)
    assert any("unit cube" in str(x.message) for x in w)
    with settings.validate_input_scaling(False):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            make_gp(X_bad, Y)
        assert not any("unit cube" in str(x.message) for x in w)


def test_logging_level_control():
    from botorch_tpu.logging import logger, set_log_level

    prev = logger.level
    try:
        set_log_level(_pylogging.DEBUG)
        assert logger.level == _pylogging.DEBUG
        set_log_level(_pylogging.CRITICAL)
        assert logger.level == _pylogging.CRITICAL
    finally:
        set_log_level(prev)


def test_phase_timer_summary():
    import time

    from botorch_tpu.diagnostics import PhaseTimer

    t = PhaseTimer()
    with t.phase("fit"):
        time.sleep(0.01)
    with t.phase("fit"):
        time.sleep(0.01)
    with t.phase("acquire"):
        time.sleep(0.005)
    s = t.summary()
    assert s["fit"]["count"] == 2
    assert s["acquire"]["count"] == 1
    assert s["fit"]["total_s"] >= 0.02
    assert s["fit"]["mean_s"] >= 0.01


def test_fit_report():
    from botorch_tpu.diagnostics import fit_report
    from botorch_tpu.ops.lbfgs import multi_start_lbfgsb

    fun = lambda v: jnp.sum(jnp.square(v - 0.3))
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (4, 3))
    res = multi_start_lbfgsb(
        fun, x0, bounds=(jnp.zeros(3), jnp.ones(3)), maxiter=25
    )
    rep = fit_report(res)
    assert rep["n_restarts"] == 4
    assert rep["best"] < 1e-6
    assert 0.0 <= rep["converged_frac"] <= 1.0
