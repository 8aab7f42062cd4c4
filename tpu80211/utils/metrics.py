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


# -- M-QAM (square, Gray-coded) -------------------------------------------------
# per-axis PAM levels at unit average constellation power, and the Gray
# code of each level index (adjacent levels differ in one bit)

def pam_levels(m: int) -> np.ndarray:
    """Per-axis PAM levels of square m-QAM, unit average symbol power.
    m ∈ {4, 16, 64} → 2/4/8 levels per axis."""
    k = int(np.sqrt(m))
    assert k * k == m and k in (2, 4, 8), m
    lv = np.arange(-(k - 1), k, 2, dtype=np.float64)   # −(k−1)…(k−1) step 2
    scale = np.sqrt(np.mean(lv**2) * 2.0)              # unit avg power (I+Q)
    return lv / scale


def _gray(idx: np.ndarray) -> np.ndarray:
    return idx ^ (idx >> 1)


def qam_ber(eq_symbols, tx_symbols, m: int = 16) -> float:
    """Hard-decision Gray-coded square-QAM bit error rate on data
    subcarriers.  Each axis is an independent Gray-coded PAM: the decided
    and transmitted level indices are Gray-mapped and differing bits
    counted — the standard BER definition for square QAM."""
    if m == 4:
        return qpsk_ber(eq_symbols, tx_symbols)
    lv = pam_levels(m)
    k = lv.size
    bits_per_axis = int(np.log2(k))
    edges = (lv[:-1] + lv[1:]) / 2.0

    eq = _as_complex(eq_symbols)[..., _DATA]
    tx = _as_complex(tx_symbols)[..., _DATA]
    errs = 0
    for comp in (np.real, np.imag):
        di = np.digitize(comp(eq), edges)
        ti = np.digitize(comp(tx), edges)
        x = _gray(di.astype(np.int64)) ^ _gray(ti.astype(np.int64))
        # popcount of the per-symbol XOR
        for b in range(bits_per_axis):
            errs += int(((x >> b) & 1).sum())
    return errs / (2 * bits_per_axis * eq.size)
