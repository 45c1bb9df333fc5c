"""Subpackage re-export surface (counterpart of the reference's
`botorch/<pkg>/__init__.py` re-exports): a reference user must find the
familiar names at the package boundary, not only in deep submodules."""

import importlib

import pytest

SURFACE = {
    "models": [
        "SingleTaskGP", "make_gp", "SVGP", "MultiTaskGP",
        "KroneckerMultiTaskGP", "PairwiseGP", "HigherOrderGP",
        "HeteroskedasticSingleTaskGP", "ModelList", "model_list_to_batched",
        "GenericDeterministicModel", "Normalize", "Warp", "Bilog",
        "fit_saas_gp", "SACGP", "LCEMGP",
    ],
    "acquisition": [
        "ExpectedImprovement", "LogExpectedImprovement",
        "UpperConfidenceBound", "PosteriorMean", "qExpectedImprovement",
        "qLogExpectedImprovement", "qLogNoisyExpectedImprovement",
        "qKnowledgeGradient", "qMaxValueEntropy", "qJointEntropySearch",
        "qExpectedHypervolumeImprovement",
        "qLogNoisyExpectedHypervolumeImprovement", "qMultiStepLookahead",
        "qHypervolumeKnowledgeGradient", "FixedFeatureAcquisitionFunction",
        "ProximalAcquisitionFunction", "get_acquisition_function",
        "prune_inferior_points",
    ],
    "posteriors": [
        "GaussianPosterior", "TransformedPosterior", "mixture_mean",
        "mixture_variance", "scalarize_posterior",
    ],
    "sampling": [
        "IIDNormalSampler", "SobolQMCNormalSampler", "StochasticSampler",
        "get_sampler", "NormalQMCEngine", "draw_matheron_paths", "run_nuts",
        "draw_sobol_samples",
    ],
    "optim": [
        "optimize_acqf", "optimize_acqf_discrete", "optimize_acqf_cyclic",
        "optimize_acqf_list", "optimize_acqf_mixed", "optimize_acqf_homotopy",
        "gen_batch_initial_conditions", "initialize_q_batch",
        "ExpMAStoppingCriterion", "Homotopy", "run_turbo",
    ],
    "generation": [
        "gen_candidates_adam", "max_posterior_sampling",
        "boltzmann_sampling", "PathwiseThompsonSampling",
    ],
    "utils": [
        "logmeanexp", "log1mexp", "fatmax", "is_non_dominated",
        "hypervolume", "infer_reference_point", "sample_polytope",
        "normalize", "unnormalize", "standardize", "SupervisedDataset",
        "MockModel", "MockPosterior", "mvnxpb",
        "TruncatedMultivariateNormal",
    ],
    "test_functions": [
        "Branin", "Hartmann", "Ackley", "BraninCurrin", "ZDT1", "DTLZ2",
        "Penicillin", "AugmentedBranin", "Ishigami",
    ],
    "parallel": ["make_mesh", "distributed_cholesky", "distributed_gp_solve"],
    "ops": [
        "psd_safe_cholesky", "cholesky_solve", "update_chol", "matern52",
        "rbf", "multi_start_lbfgsb", "kernel_matrix",
    ],
}


@pytest.mark.parametrize("pkg", sorted(SURFACE))
def test_subpackage_surface(pkg):
    mod = importlib.import_module(f"botorch_tpu.{pkg}")
    missing = [n for n in SURFACE[pkg] if not hasattr(mod, n)]
    assert not missing, f"botorch_tpu.{pkg} missing re-exports: {missing}"
    assert set(SURFACE[pkg]) <= set(mod.__all__)
