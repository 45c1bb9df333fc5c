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
