"""Dataset integrity: the two views of the capture must agree.

inputs.h stores frequency-domain tables rounded to 4 decimals;
WiFi_inputs.m stores the time-domain capture.  Pushing the time-domain
packet through our block extraction / preamble ops must land on the
frequency tables within the 4-decimal rounding of the shipped literals.
"""

import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C
from tpu80211.ops import extract_blocks, preamble_fft, noise_power_estimate

TABLE_TOL = 1.5e-4  # 4-decimal literals ⇒ per-component rounding ≤ 5e-5


def test_shapes(capture):
    assert capture.tx_symb.shape == (C.N_BLOCKS, C.N_SC)
    assert capture.rx_symb.shape == (C.N_BLOCKS, C.N_SC)
    assert capture.tx_packet.shape == (C.PACKET_SAMPLES,)
    assert capture.tx_lptot.shape == (C.PREAMBLE_SAMPLES,)


def test_block_extraction_matches_inputs_h(capture):
    for pkt, symb in [
        (capture.tx_packet, capture.tx_symb),
        (capture.rx_packet, capture.rx_symb),
    ]:
        got = np.asarray(extract_blocks(jnp.asarray(pkt)))
        assert np.abs(got - symb).max() < TABLE_TOL


def test_preamble_fft_matches_inputs_h(capture):
    for lp, pre in [
        (capture.tx_lptot, capture.tx_preamble_fft),
        (capture.rx_lptot, capture.rx_preamble_fft),
    ]:
        got = np.asarray(preamble_fft(jnp.asarray(lp)))
        assert np.abs(got - pre).max() < TABLE_TOL


def test_noise_power_matches_ow2(capture):
    got = float(noise_power_estimate(jnp.asarray(capture.rx_lptot)))
    assert abs(got - capture.ow2) / capture.ow2 < 1e-4


def test_synthetic_frequency_offset():
    """CFO option rotates each successive OFDM block by a constant phase
    (the dominant effect of the capture's 20 kHz offset, WiFi_RX.m:9)."""
    import jax
    import jax.numpy as jnp
    from tpu80211.datasets import synthetic

    fb0 = synthetic.generate(jax.random.PRNGKey(5), 4, snr_db=200.0)
    fb1 = synthetic.generate(jax.random.PRNGKey(5), 4, snr_db=200.0, fo_hz=20e3)
    r = np.asarray(fb1.rx_symb) / np.asarray(fb0.rx_symb)
    # per-block phase: 2π·20e3·80·b/20e6 = 0.0504·b rad
    ang = np.angle(np.nanmedian(r, axis=(0, 2)))
    want = (2 * np.pi * 20e3 * 80 / 20e6) * np.arange(15)
    want = np.angle(np.exp(1j * want))  # wrap
    np.testing.assert_allclose(ang, want, atol=1e-3)
