"""Quality metrics: channel-estimation MSE, EVM, pseudo-BER.

The reference publishes no accuracy numbers at all — its record is four
CFR plot PNGs (SURVEY.md §6).  These metrics quantify what those plots
eyeball, batched over frames, and feed the structured Report
(utils/timing.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C
from tpu80211.cplx import Cplx

_DATA = np.asarray(C.DATA_MASK)


def _as_complex(x):
    if isinstance(x, Cplx):
        return x.to_complex()
    return np.asarray(x)


def cfr_mse(h_est, h_true, exclude_dc: bool = True) -> float:
    """Mean |H_est − H_true|² over data subcarriers (and frames)."""
    a = _as_complex(h_est)
    b = _as_complex(h_true)
    mask = _DATA if exclude_dc else np.ones(C.N_SC, bool)
    d = (a - b)[..., mask]
    return float(np.mean(np.abs(d) ** 2))


def cfr_nmse_db(h_est, h_true) -> float:
    """Normalized MSE in dB: 10·log10(Σ|ΔH|²/Σ|H|²) on data subcarriers."""
    a = _as_complex(h_est)
    b = _as_complex(h_true)
    d = (a - b)[..., _DATA]
    ref = b[..., _DATA]
    return float(10 * np.log10(np.sum(np.abs(d) ** 2) / np.sum(np.abs(ref) ** 2)))


def evm_rms(eq_symbols, tx_symbols) -> float:
    """RMS error-vector magnitude of equalized vs transmitted symbols,
    over data subcarriers, as a fraction of RMS tx power."""
    eq = _as_complex(eq_symbols)
    tx = _as_complex(tx_symbols)
    d = (eq - tx)[..., _DATA]
    ref = tx[..., _DATA]
    return float(
        np.sqrt(np.mean(np.abs(d) ** 2) / np.mean(np.abs(ref) ** 2))
    )


def qpsk_ber(eq_symbols, tx_symbols) -> float:
    """Hard-decision QPSK bit error rate on data subcarriers (valid when tx
    is QPSK, e.g. the synthetic generator's frames)."""
    eq = _as_complex(eq_symbols)[..., _DATA]
    tx = _as_complex(tx_symbols)[..., _DATA]
    errs = (np.sign(eq.real) != np.sign(tx.real)).sum() + (
        np.sign(eq.imag) != np.sign(tx.imag)
    ).sum()
    return float(errs) / (2 * eq.size)
