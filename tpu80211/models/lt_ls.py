"""LT-LS: least-squares channel estimate from the long-training preamble.

MATLAB golden model: H = conj(X)·Y ./ (conj(X)·X) on subcarriers 1-26 and
28-53, DC forced to 0 (WiFi_channel_estimation_LT_LS.m:1-5).

C-parity mode reproduces main.c:66-75: the "conjugate" is the real scalar
Re(tx)−Im(tx) (SURVEY.md §2.5.3), so the estimate reduces to rx/tx with the
C code's exact order of operations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C
from tpu80211.config import EstimatorMode

_DC = np.zeros((C.N_SC,), dtype=bool)
_DC[C.DC_IDX] = True


def lt_ls(
    tx_pre: jnp.ndarray,  # (..., 53) transmitted LTS spectrum
    rx_pre: jnp.ndarray,  # (..., 53) received LTS spectrum
    mode: EstimatorMode = EstimatorMode.MATH,
) -> jnp.ndarray:
    """(..., 53) channel frequency response; DC bin is exactly zero."""
    if mode == EstimatorMode.C_PARITY:
        conj = (tx_pre.real - tx_pre.imag).astype(tx_pre.dtype)  # main.c:69-70
    else:
        conj = jnp.conj(tx_pre)
    # guard the DC division (tx there is nonzero in the capture, but keep
    # the op total-function for synthetic inputs), then force DC to 0
    denom = conj * tx_pre
    denom = jnp.where(_DC, jnp.ones((), denom.dtype), denom)
    h = (conj * rx_pre) / denom
    return jnp.where(_DC, jnp.zeros((), h.dtype), h)
