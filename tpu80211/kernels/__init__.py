"""Pallas TPU kernels (see mmse_solve.py, fused_chain.py)."""

import jax


def on_tpu() -> bool:
    """True when the default backend compiles Pallas natively (vs
    interpret mode on CPU)."""
    return jax.default_backend() in ("tpu", "axon")
