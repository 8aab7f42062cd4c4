"""Complex linear-algebra helpers shared by the estimators.

TPU-native replacement for the reference's dense kernel library
(``utils.c``): the 53×53 DFT matrix (main.c:22-26,
WiFi_channel_estimation_PS_MMSE.m:16-22) is a trace-time constant; the
cofactor-expansion inverse (utils.c:141-170) never exists — where the math
needs ``inv(F)`` we use the unitary-DFT identity ``F⁻¹ = Fᴴ/N``, and where
it needs ``Ryy⁻¹·y`` we use batched solves or the rank-1 Sherman-Morrison
closed form (see models/ps_mmse.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C


@functools.lru_cache(maxsize=None)
def dft_matrix(n: int = C.N_SC) -> np.ndarray:
    """F[t, f] = exp(-2πi·t·f/n), float64 NumPy trace-time constant.

    Matches main.c:22-26 / WiFi_channel_estimation_PS_MMSE.m:16-22.
    """
    t = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(t, t) / n)


def idft_apply(x: jnp.ndarray, n: int = C.N_SC) -> jnp.ndarray:
    """ifft along the last axis — F⁻¹ @ x without ever forming a cofactor
    inverse (replaces inverse(F) at main.c:186 / ifft at ..._PS_MMSE.m:26)."""
    return jnp.fft.ifft(x, n=n, axis=-1)


def hermitian_quirk(m: jnp.ndarray) -> jnp.ndarray:
    """The reference's 'hermitian' (utils.c:3-7): res[c][r] = Re(M[r][c]) −
    Im(M[r][c]) — a *real* transpose-like map, NOT the conjugate transpose.
    Kept verbatim for C-parity mode (SURVEY.md §2.5.1)."""
    return jnp.swapaxes(m.real - m.imag, -1, -2).astype(m.dtype)


def addition_quirk(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """The reference's 'addition' (utils.c:111-121) computes M1+M1 and
    ignores M2 (SURVEY.md §2.5.2). Kept for C-parity mode."""
    del m2
    return m1 + m1
