r"""Exception and warning taxonomy (counterpart of `botorch/exceptions/`:
`errors.py:74`, `warnings.py:109`)."""


class BotorchTPUError(Exception):
    """Base error."""


class CandidateGenerationError(BotorchTPUError):
    """Candidate generation failed."""


class InputDataError(BotorchTPUError):
    """Invalid input data."""


class ModelFittingError(BotorchTPUError):
    """All fitting restarts failed."""


class OptimizationTimeoutError(BotorchTPUError):
    """Optimization exceeded its wall-clock budget."""


class UnsupportedError(BotorchTPUError):
    """Unsupported configuration."""


class TensorDimensionError(InputDataError):
    """Tensor has unexpected dimensions."""


class BotorchTPUWarning(Warning):
    """Base warning."""


class BadInitialCandidatesWarning(BotorchTPUWarning):
    """Initial conditions had non-finite or degenerate acquisition values."""


class InputDataWarning(BotorchTPUWarning):
    """Input data violates scaling conventions (e.g. not standardized)."""


class OptimizationWarning(BotorchTPUWarning):
    """An optimizer reported non-convergence."""


class SamplingWarning(BotorchTPUWarning):
    """Sampling fell back to a less accurate method."""


class NumericsWarning(BotorchTPUWarning):
    """A numerically fragile legacy path was used (prefer the Log variant)."""


# Reference-name aliases (migration ease; reference `exceptions/errors.py`,
# `exceptions/warnings.py`)
BotorchError = BotorchTPUError
BotorchWarning = BotorchTPUWarning
BotorchTensorDimensionError = TensorDimensionError


class DeprecationError(BotorchTPUError):
    """Reference `exceptions/errors.py` `DeprecationError`."""


class UserInputWarning(BotorchTPUWarning):
    """Reference `exceptions/warnings.py` `UserInputWarning`."""


class CostAwareWarning(BotorchTPUWarning):
    """Reference `exceptions/warnings.py` `CostAwareWarning`."""


class BotorchTensorDimensionWarning(BotorchTPUWarning):
    """Reference `exceptions/warnings.py` `BotorchTensorDimensionWarning`."""
