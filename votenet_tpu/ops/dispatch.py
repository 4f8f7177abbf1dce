"""Backend dispatch: Pallas TPU kernels vs their XLA twins.

Every hot op has two implementations with identical semantics: a Pallas TPU
kernel (:mod:`votenet_tpu.ops.pallas`) and a pure-XLA twin that runs on any
backend and serves as the correctness oracle. This module owns the choice:

- :func:`use_pallas` — True iff Pallas kernels should be used right now
  (enabled AND running on a TPU backend). Ops consult this at trace time.
- :func:`set_use_pallas` — flip the global gate; ``Config.use_pallas`` is
  applied through this by the training/eval entry points, so
  ``--use_pallas=False`` genuinely forces the XLA twins even on TPU.
- :func:`pallas_disabled` — context manager for tests/debugging.

The reference has no equivalent (its CUDA ops are the only implementation);
this is the TPU-native replacement for "which .so did tf.load_op_library
pick up".
"""

from __future__ import annotations

import contextlib

_enabled: bool = True


def set_use_pallas(enabled: bool) -> None:
    """Globally enable/disable Pallas kernels (XLA twins used when False)."""
    global _enabled
    _enabled = bool(enabled)


def use_pallas() -> bool:
    """True iff ops should dispatch to Pallas kernels for this trace."""
    from votenet_tpu.ops.pallas import tpu_available

    return _enabled and tpu_available()


@contextlib.contextmanager
def pallas_disabled():
    """Force the XLA twins within the context (regardless of backend)."""
    global _enabled
    prev = _enabled
    _enabled = False
    try:
        yield
    finally:
        _enabled = prev
