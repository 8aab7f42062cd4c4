"""Quality-metric tests on synthetic frames: end-to-end sanity that the
estimators + equalizer actually recover data at SNR 40 dB."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu80211.cplx import Cplx
from tpu80211.datasets import synthetic
from tpu80211.pipeline import sc
from tpu80211.utils import metrics


@pytest.fixture(scope="module")
def run():
    fb = synthetic.generate(jax.random.PRNGKey(11), batch=32, snr_db=40.0)
    # equalize with the MMSE blend for the quality gates — the default
    # PS-Linear blend (reference semantics, WiFi_RX.m:60) cannot track the
    # synthetic 8-tap channel from 4 pilots
    out = sc.rx_chain_freq(
        Cplx.from_complex(np.asarray(fb.tx_preamble_fft)),
        Cplx.from_complex(np.asarray(fb.rx_preamble_fft)),
        Cplx.from_complex(np.asarray(fb.tx_symb)),
        Cplx.from_complex(np.asarray(fb.rx_symb)),
        jnp.asarray(np.asarray(fb.ow2)),
        equalize_with="h_mmse",
    )
    return fb, out


def test_mmse_nmse_below_noise_floor(run):
    fb, out = run
    nmse = metrics.cfr_nmse_db(out.h_mmse, fb.h_true)
    # SNR 40 dB ⇒ estimation NMSE should be well below −20 dB
    assert nmse < -20.0, nmse


def test_estimator_quality_ordering(run):
    """MMSE (uses all data + prior) beats plain linear interpolation."""
    fb, out = run
    assert metrics.cfr_mse(out.h_mmse, fb.h_true) < metrics.cfr_mse(
        out.h_linear, fb.h_true
    )


def test_qpsk_ber_zero_at_40db(run):
    fb, out = run
    ber = metrics.qpsk_ber(out.eq, fb.tx_symb)
    assert ber < 1e-3, ber


def test_evm_small(run):
    fb, out = run
    evm = metrics.evm_rms(out.eq, fb.tx_symb)
    assert evm < 0.2, evm
