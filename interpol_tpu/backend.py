"""Backend selection: the rebuild's analogue of the reference's one-flag
"config system" (interpol/backend.py:1 + the jitfields adapter,
interpol/jitfields.py).

In the reference the fast native tier is an *optional external* package;
here the fast tier is the in-tree Pallas kernel set and this module picks
between implementations:

- ``"auto"``     : Pallas kernels on TPU where available & profitable,
                   pure-jnp XLA kernels otherwise (default)
- ``"xla"``      : always the pure jax.numpy kernels (portable reference
                   tier; runs on CPU/GPU/TPU)
- ``"pallas"``   : force Pallas TPU kernels (errors off-TPU)

Use :func:`set_backend` / :func:`get_backend`, or the ``use_backend``
context manager.
"""
from __future__ import annotations

import contextlib
import threading

__all__ = ["set_backend", "get_backend", "use_backend"]

_VALID = ("auto", "xla", "pallas")
_state = threading.local()


def get_backend() -> str:
    return getattr(_state, "backend", "auto")


def set_backend(name: str) -> None:
    if name not in _VALID:
        raise ValueError(f"Unknown backend {name!r}; expected one of {_VALID}")
    _state.backend = name


@contextlib.contextmanager
def use_backend(name: str):
    old = get_backend()
    set_backend(name)
    try:
        yield
    finally:
        set_backend(old)
