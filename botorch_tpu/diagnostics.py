r"""Observability: phase timing, optimization metrics, profiler hooks.

The reference's observability is a module logger plus
`OptimizationResult.runtime` (`optim/core.py:46-52,139`) and callback
hooks. SURVEY §5 prescribes structured per-phase metrics + jax profiler
integration for the TPU build — this module provides both:

  * `PhaseTimer` — nested wall-clock phases collected into a dict
    (`timer.summary()`), used by drivers;
  * `trace(path)` — context manager around `jax.profiler` for XLA-level
    traces viewable in TensorBoard/Perfetto;
  * `fit_report` / `optimize_report` — structured summaries of solver
    results (iterations, convergence fractions, final values).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax
import numpy as np

from botorch_tpu.logging import logger


class PhaseTimer:
    """Accumulate wall-clock per named phase (re-entrant)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.debug("phase %s: %.3fs", name, dt)

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 4),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level profiler trace (TensorBoard/Perfetto viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fit_report(result) -> dict:
    """Summary of a `multi_start_lbfgsb` result batch."""
    fun = np.asarray(result.fun)
    return {
        "best": float(np.nanmin(fun)),
        "worst": float(np.nanmax(fun)),
        "converged_frac": float(np.asarray(result.converged).mean()),
        "mean_iters": float(np.asarray(result.n_iter).mean()),
        "n_restarts": int(fun.shape[0]),
    }


def nuts_report(stats: dict) -> dict:
    """Summary of `run_nuts` statistics."""
    return {
        "accept_prob": float(stats["accept_prob"]),
        "divergence_rate": float(stats["divergence_rate"]),
        "step_size": float(stats["step_size"]),
    }
