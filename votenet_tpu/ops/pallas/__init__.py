"""Pallas TPU kernels for the hot point-cloud ops.

Each kernel has an XLA twin in :mod:`votenet_tpu.ops` with identical
semantics (the twins are the correctness oracles; tests compare them in
interpret mode). Dispatch helpers pick Pallas on TPU backends and fall back
to XLA elsewhere.
"""

from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas

__all__ = ["farthest_point_sample_pallas", "tpu_available"]


def tpu_available() -> bool:
    """True when the default JAX backend is a TPU (incl. the axon tunnel)."""
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
