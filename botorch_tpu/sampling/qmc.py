r"""Quasi-MC normal engines.

Counterpart of `botorch/sampling/qmc.py:27,101` (`NormalQMCEngine`,
`MultivariateNormalQMCEngine`): scrambled-Sobol points mapped to
(multivariate) Gaussians. The reference offers Box-Muller or inverse-CDF;
here the inverse CDF (`ndtri`) is the default — one-to-one with the
low-discrepancy points, which preserves their stratification (Box-Muller
pairs dimensions and scrambles the structure).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from botorch_tpu.ops.chol import psd_safe_cholesky
from botorch_tpu.sampling.sobol import draw_sobol, sobol_table

Array = jax.Array


class NormalQMCEngine:
    """Engine for drawing qMC N(0, I_d) samples."""

    def __init__(self, d: int, seed: Optional[int] = None, scramble: bool = True):
        self.d = d
        self._sv, self._shift = sobol_table(d, scramble=scramble, seed=seed)
        self._skip = 0

    def draw(self, n: int) -> Array:
        u = draw_sobol(self._sv, self._shift, n, skip=self._skip)
        self._skip += n
        return jax.scipy.special.ndtri(u)


class MultivariateNormalQMCEngine(NormalQMCEngine):
    """qMC draws from `N(mean, cov)` via the Cholesky transform
    (reference `qmc.py:101`)."""

    def __init__(self, mean: Array, cov: Array, seed: Optional[int] = None,
                 scramble: bool = True):
        super().__init__(mean.shape[-1], seed=seed, scramble=scramble)
        self._mean = jnp.asarray(mean)
        self._L = psd_safe_cholesky(jnp.asarray(cov))

    def draw(self, n: int) -> Array:
        z = super().draw(n)
        return self._mean + z @ self._L.T
