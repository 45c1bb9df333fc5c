"""Sampler re-exports (counterpart of `botorch/sampling/__init__.py`)."""

from botorch_tpu.sampling.nuts import (
    DAState,
    da_init,
    da_update,
    nuts_transition,
    run_nuts,
)
from botorch_tpu.sampling.pathwise import (
    MatheronPath,
    draw_matheron_paths,
    get_gp_samples,
    get_matheron_path_model,
)
from botorch_tpu.sampling.qmc import (
    MultivariateNormalQMCEngine,
    NormalQMCEngine,
)
from botorch_tpu.sampling.samplers import (
    ForkedRNGSampler,
    IIDNormalSampler,
    IndexSampler,
    ListSampler,
    PairwiseIIDNormalSampler,
    PairwiseSobolQMCNormalSampler,
    SobolQMCNormalSampler,
    StochasticSampler,
    get_sampler,
)
from botorch_tpu.sampling.sobol import (
    bits_to_unit,
    draw_sobol,
    draw_sobol_bits,
    draw_sobol_normal_samples,
    draw_sobol_samples,
    sobol_table,
)

__all__ = [
    "DAState",
    "ForkedRNGSampler",
    "IIDNormalSampler",
    "IndexSampler",
    "ListSampler",
    "PairwiseIIDNormalSampler",
    "PairwiseSobolQMCNormalSampler",
    "MatheronPath",
    "MultivariateNormalQMCEngine",
    "NormalQMCEngine",
    "SobolQMCNormalSampler",
    "StochasticSampler",
    "bits_to_unit",
    "da_init",
    "da_update",
    "draw_matheron_paths",
    "get_gp_samples",
    "draw_sobol",
    "draw_sobol_bits",
    "draw_sobol_normal_samples",
    "draw_sobol_samples",
    "get_matheron_path_model",
    "get_sampler",
    "nuts_transition",
    "run_nuts",
    "sobol_table",
]
