"""Per-subcarrier equalization with LT↔PS-blended CFR.

WiFi_Equalization.m:3-8 — for block i (1-based of n), the equalizing CFR is
H_UTIL = ((n−i)/n)·H_LT + (i/n)·H_PS and the received symbols are divided
per subcarrier, *skipping DC* (index 26), which stays zero.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C


def equalize(
    rx_blocks: jnp.ndarray,  # (..., n_blocks, 53)
    h_lt: jnp.ndarray,       # (..., 53)
    h_ps: jnp.ndarray,       # (..., 53)
) -> jnp.ndarray:
    """Equalized symbols, shape (..., n_blocks, 53); DC column is zero."""
    n = rx_blocks.shape[-2]
    i = jnp.arange(1, n + 1, dtype=rx_blocks.real.dtype)[:, None]  # 1-based
    h_util = ((n - i) / n) * h_lt[..., None, :] + (i / n) * h_ps[..., None, :]
    dc = np.zeros((C.N_SC,), dtype=bool)
    dc[C.DC_IDX] = True
    # avoid 0/0 on the skipped DC bin, then force it to exactly zero
    safe = jnp.where(dc, jnp.ones((), h_util.dtype), h_util)
    eq = rx_blocks / safe
    return jnp.where(dc, jnp.zeros((), eq.dtype), eq)
