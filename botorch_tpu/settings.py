r"""Global settings as context managers (counterpart of
`botorch/settings.py:16-111`)."""

from __future__ import annotations


class _Flag:
    _state: bool = False

    def __init__(self, state: bool = True):
        self._enter_state = state

    @classmethod
    def on(cls) -> bool:
        return cls._state

    @classmethod
    def off(cls) -> bool:
        return not cls._state

    def __enter__(self):
        self._prev = type(self)._state
        type(self)._state = self._enter_state
        return self

    def __exit__(self, *args):
        type(self)._state = self._prev
        return False


class debug(_Flag):
    """Enable verbose numerics diagnostics."""

    _state = False


class validate_input_scaling(_Flag):
    """Warn when train inputs are far outside the unit cube / targets
    unstandardized (reference `settings.py:69-81`)."""

    _state = True


class propagate_grads(_Flag):
    """Allow gradients through train-data caches (fantasization paths)."""

    _state = False


def enable_x64(enable: bool = True) -> None:
    """Opt into double-precision mode (reference parity: BoTorch is
    float64-first, `models/gpytorch.py:128-133`; this framework is
    float32-first because TPUs execute f64 in software).

    Flips JAX's global x64 flag; combine with `make_gp(..., dtype=
    jnp.float64)` to run the kernel/Cholesky/MLL/posterior stack in
    double precision. Call before building models — already-compiled
    float32 programs are unaffected (dtype is part of the jit cache key).
    The measured f32+jitter vs f64 posterior drift across condition
    numbers 1e6-1e12 is documented in PRECISION.md; f32 remains the
    default and the benchmarked configuration.
    """
    import jax

    jax.config.update("jax_enable_x64", bool(enable))
