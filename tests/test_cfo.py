"""CFO estimation/correction + pilot CPE correction (ops/cfo.py).

The reference has no synchronization stage (its capture was generated
with FO = 20e3, WiFi_RX.m:9, but reached the estimators pre-compensated);
these tests build frames carrying a *real* time-domain CFO and check the
sync stages recover what the uncorrected chain destroys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu80211 import constants as C
from tpu80211.cplx import Cplx
from tpu80211.datasets import synthetic
from tpu80211.ops import cfo
from tpu80211.pipeline import sc

EPS_20KHZ = 20e3 / 20e6  # cycles/sample at 20 MS/s


def _c(x):
    return Cplx.from_complex(np.asarray(x), jnp.float32)


@pytest.fixture(scope="module")
def impaired():
    """Batch of synthetic frames with a genuine time-domain 20 kHz CFO,
    continuous phase from preamble through packet."""
    b = 4
    fb = synthetic.generate(jax.random.PRNGKey(7), b, snr_db=40.0)
    tx_pkt = synthetic.synthesize_time(fb.tx_symb)
    rx_pkt = synthetic.synthesize_time(fb.rx_symb)
    tx_lp = synthetic.synthesize_preamble_time(fb.tx_preamble_fft)
    rx_lp = synthetic.synthesize_preamble_time(fb.rx_preamble_fft)
    rx_lp_i = synthetic.apply_time_cfo(rx_lp, EPS_20KHZ, start=0)
    rx_pkt_i = synthetic.apply_time_cfo(
        rx_pkt, EPS_20KHZ, start=C.PREAMBLE_SAMPLES
    )
    return fb, _c(tx_pkt), _c(rx_pkt_i), _c(tx_lp), _c(rx_lp_i)


def test_estimate_recovers_cfo(impaired):
    _, _, _, _, rx_lp = impaired
    eps = np.asarray(cfo.estimate_cfo(rx_lp))
    np.testing.assert_allclose(eps, EPS_20KHZ, rtol=2e-2)


def test_roundtrip_synthesis():
    """preamble_fft(synthesize_preamble_time(x)) == x."""
    fb = synthetic.generate(jax.random.PRNGKey(3), 2, snr_db=60.0)
    lp = synthetic.synthesize_preamble_time(fb.rx_preamble_fft)
    back = sc.preamble_fft(_c(lp)).to_complex()
    np.testing.assert_allclose(
        back, np.asarray(fb.rx_preamble_fft), atol=1e-5
    )


def test_derotate_inverts_impairment(impaired):
    _, _, rx_pkt_i, _, rx_lp_i = impaired
    pkt, lp, eps = cfo.correct_cfo(rx_pkt_i, rx_lp_i)
    # derotation with the estimated eps ≈ removing the applied impairment
    clean = synthetic.apply_time_cfo(
        rx_pkt_i.to_complex(), -EPS_20KHZ, start=C.PREAMBLE_SAMPLES
    )
    err = np.abs(pkt.to_complex() - np.asarray(clean)).max()
    assert err < 2e-3 * np.abs(np.asarray(clean)).max() + 1e-6


def test_sync_chain_rescues_cfo_frames(impaired):
    """With a real 20 kHz CFO the uncorrected chain's equalized output is
    garbage; sync=True recovers near-clean EVM."""
    fb, tx_pkt, rx_pkt_i, tx_lp, rx_lp_i = impaired
    tx = np.asarray(fb.tx_symb)

    def med_err(out):
        eq = out.eq.to_complex()
        mask = np.asarray(C.DATA_MASK)
        return np.median(np.abs(eq - tx)[..., mask])

    raw = med_err(sc.rx_chain(tx_pkt, rx_pkt_i, tx_lp, rx_lp_i,
                              equalize_with="h_mmse"))
    fixed = med_err(sc.rx_chain(tx_pkt, rx_pkt_i, tx_lp, rx_lp_i,
                                equalize_with="h_mmse", sync=True))
    # QPSK symbols have unit-ish magnitude; garbage ≈ O(1) error
    assert raw > 0.3, raw
    assert fixed < 0.1, fixed
    assert fixed < raw / 5


def test_sync_noop_on_clean_frames(impaired):
    """On CFO-free frames sync must not degrade the result (the capture
    case: LTS repeats agree, CPE <1°)."""
    fb, tx_pkt, _, tx_lp, _ = impaired
    rx_pkt = _c(synthetic.synthesize_time(fb.rx_symb))
    rx_lp = _c(synthetic.synthesize_preamble_time(fb.rx_preamble_fft))
    tx = np.asarray(fb.tx_symb)
    mask = np.asarray(C.DATA_MASK)

    def med_err(out):
        return np.median(np.abs(out.eq.to_complex() - tx)[..., mask])

    base = med_err(sc.rx_chain(tx_pkt, rx_pkt, tx_lp, rx_lp,
                               equalize_with="h_mmse"))
    synced = med_err(sc.rx_chain(tx_pkt, rx_pkt, tx_lp, rx_lp,
                                 equalize_with="h_mmse", sync=True))
    assert synced < base * 1.1 + 1e-3, (base, synced)


def test_constellation_plot(tmp_path):
    """plot_constellation writes a scatter PNG (the symbol-domain accuracy
    artifact complementing the reference's CFR curves)."""
    from tpu80211.utils.plots import plot_constellation

    rng = np.random.default_rng(0)
    sym = (rng.standard_normal(200) + 1j * rng.standard_normal(200))
    qpsk = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2.0)
    out = plot_constellation({"a": sym, "b": sym * 0.5},
                             str(tmp_path / "c.png"), ref_points=qpsk)
    import os
    assert os.path.getsize(out) > 1000
