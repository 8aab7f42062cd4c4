"""Channel-model registry: the power-delay profiles behind `channel_model`.

The reference declares a channel-model parameter with values A–E
(`WiFi_RX.m:6` — "channel_model = 'A'; % Values: A, B, C, D, E") but
contains no channel code at all: the letters name the ETSI BRAN /
HiperLAN-2 indoor models the capture was generated with offline.  This
module implements that parameter surface for the synthetic generators:
each model is an exponentially-decaying power-delay profile with the
ETSI rms delay spread, sampled at the receiver rate.

| model | rms delay spread | environment (ETSI BRAN) |
|-------|------------------|--------------------------|
| A     | 50 ns            | office, NLOS             |
| B     | 100 ns           | open space / office, NLOS|
| C     | 150 ns           | large open space, NLOS   |
| D     | 140 ns           | large open space, LOS    |
| E     | 250 ns           | large open space, NLOS   |

``model=None`` keeps the repo's legacy profile (rms 2.0 samples ≈ model
B at 20 MHz) so existing statistics, tests, and the Wiener interpolation
matrix (ops/interp.py, trained on that profile) are unchanged.
"""

from __future__ import annotations

import numpy as np

CHANNEL_MODELS = {
    "A": 50e-9,
    "B": 100e-9,
    "C": 150e-9,
    "D": 140e-9,
    "E": 250e-9,
}

LEGACY_RMS_SAMPLES = 2.0
LEGACY_N_TAPS = 8


def rms_samples(model: str | None, sample_rate_hz: float = 20e6) -> float:
    """RMS delay spread in samples at ``sample_rate_hz``."""
    if model is None:
        return LEGACY_RMS_SAMPLES
    return CHANNEL_MODELS[model.upper()] * sample_rate_hz


def n_taps_for(model: str | None, sample_rate_hz: float = 20e6) -> int:
    """FIR length covering ~5 rms spreads (≥ the legacy 8 taps, ≤ the
    16-sample cyclic prefix so ISI never leaks across blocks)."""
    if model is None:
        return LEGACY_N_TAPS
    taps = int(np.ceil(5.0 * rms_samples(model, sample_rate_hz))) + 1
    return int(np.clip(taps, LEGACY_N_TAPS, 16))


def pdp(model: str | None = None, sample_rate_hz: float = 20e6,
        n_taps: int | None = None) -> np.ndarray:
    """Normalized exponential power-delay profile, shape (n_taps,)."""
    rms = rms_samples(model, sample_rate_hz)
    if n_taps is None:
        n_taps = n_taps_for(model, sample_rate_hz)
    p = np.exp(-np.arange(n_taps) / rms)
    return p / p.sum()
