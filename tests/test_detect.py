"""Packet detection + timing sync (ops/detect.py) — the stage the
reference's ``threshold`` parameter promises (WiFi_RX.m:7) but never
implements."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu80211.cplx import Cplx
from tpu80211.datasets import synthetic
from tpu80211.ops import detect

B, N = 16, 2048


def _noise(rng, shape, amp):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)) * amp


def _embed(rng, lp, pkt, amp=0.01):
    stream = _noise(rng, (B, N), amp)
    offs = rng.integers(50, N - 1400, B)
    for i, o in enumerate(offs):
        stream[i, o:o + 160] += lp if lp.ndim == 1 else lp[i]
        stream[i, o + 160:o + 1360] += pkt[i]
    return Cplx.from_complex(stream, jnp.float64), offs


def _clean_preamble():
    lts = synthetic._lts_spectrum().astype(np.complex128)
    return np.asarray(synthetic.synthesize_preamble_time(jnp.asarray(lts)))


def test_detect_exact_on_clean_channel():
    rng = np.random.default_rng(0)
    lp1 = _clean_preamble()
    fb = synthetic.generate(jax.random.PRNGKey(1), B, snr_db=30.0)
    pkt = np.asarray(synthetic.synthesize_time(jnp.asarray(np.asarray(fb.tx_symb))))
    x, offs = _embed(rng, lp1, pkt)
    ref = detect.lts_time_symbol(lp1)
    res = jax.jit(lambda x: detect.detect_packet(x, ref))(x)
    assert np.asarray(res["detected"]).all()
    # default timing advance of 4: start = true offset - 4 exactly
    np.testing.assert_array_equal(np.asarray(res["start"]), offs - 4)


def test_detect_through_channel_within_cp():
    """Through a random per-frame channel the start lands within a few
    samples (the channel's bulk delay) — inside the cyclic prefix, so the
    chain equalizes the residual as a phase ramp."""
    rng = np.random.default_rng(0)
    fb = synthetic.generate(jax.random.PRNGKey(1), B, snr_db=30.0)
    lp = np.asarray(synthetic.synthesize_preamble_time(
        jnp.asarray(fb.tx_preamble_fft) * jnp.asarray(fb.h_true)))
    pkt = np.asarray(synthetic.synthesize_time(jnp.asarray(np.asarray(fb.rx_symb))))
    x, offs = _embed(rng, lp, pkt)
    ref = detect.lts_time_symbol(_clean_preamble())
    res = jax.jit(lambda x: detect.detect_packet(x, ref))(x)
    assert np.asarray(res["detected"]).all()
    err = np.asarray(res["start"]) - offs
    # within [-advance, +CP/2): early is safe (cyclic), late is bounded
    assert (err >= -4).all() and (err < 8).all(), err


def test_detect_capture_frame(capture):
    """The shipped capture (real channel 'A' + 20 kHz CFO) embedded in
    noise: detected with ≤2-sample timing spread."""
    rng = np.random.default_rng(0)
    frame = np.concatenate([capture.rx_lptot, capture.rx_packet])
    stream = _noise(rng, (B, N), 0.002)
    offs = rng.integers(50, N - 1400, B)
    for i, o in enumerate(offs):
        stream[i, o:o + 1360] += frame
    x = Cplx.from_complex(stream, jnp.float64)
    ref = detect.lts_time_symbol(capture.tx_lptot)
    res = jax.jit(lambda x: detect.detect_packet(x, ref))(x)
    assert np.asarray(res["detected"]).all()
    err = np.asarray(res["start"]) - offs
    assert (err >= -4).all() and (err <= 0).all(), err


def test_no_false_alarm_on_noise(capture):
    rng = np.random.default_rng(3)
    x = Cplx.from_complex(_noise(rng, (8, N), 0.002), jnp.float64)
    res = detect.detect_packet(x, detect.lts_time_symbol(capture.tx_lptot))
    assert not np.asarray(res["detected"]).any()
    # undetected rows return sentinel indices, never plausible garbage
    # (ADVICE round-3): -1 everywhere when the metric never crossed
    assert (np.asarray(res["coarse"]) == -1).all()
    assert (np.asarray(res["start"]) == -1).all()


def test_extract_and_run_chain(capture):
    """End-to-end: raw stream → detect → extract → full RX chain equals
    the chain run on the pre-aligned frame (the detected offset is exact
    at this SNR for the capture)."""
    from tpu80211.config import EstimatorMode
    from tpu80211.pipeline import rx as rx_cpx

    rng = np.random.default_rng(7)
    frame = np.concatenate([capture.rx_lptot, capture.rx_packet])
    stream = _noise(rng, (4, N), 1e-5)  # near-noiseless: bit-level check
    offs = rng.integers(50, N - 1400, 4)
    for i, o in enumerate(offs):
        stream[i, o:o + 1360] += frame
    x = Cplx.from_complex(stream, jnp.float64)
    ref = detect.lts_time_symbol(capture.tx_lptot)
    res = detect.detect_packet(x, ref)
    err = np.asarray(res["start"]) - offs
    # the capture's channel has ~1 sample of bulk delay; with the
    # default 4-sample timing advance the start lands a few samples
    # EARLY — inside the cyclic prefix, a pure per-bin phase ramp
    assert (err >= -4).all() and (err <= -2).all(), err
    lp, pkt = detect.extract_packet(x, res["start"])
    # extraction plumbing: the slices equal the stream at the detected
    # offsets exactly
    for i in range(4):
        s = int(np.asarray(res["start"])[i])
        np.testing.assert_array_equal(
            np.asarray(lp.re)[i], np.asarray(x.re)[i, s:s + 160])
        np.testing.assert_array_equal(
            np.asarray(pkt.re)[i], np.asarray(x.re)[i, s + 160:s + 1360])
    out = rx_cpx.rx_chain(
        jnp.broadcast_to(jnp.asarray(capture.tx_packet), (4, 1200)),
        jnp.asarray(pkt.re + 1j * pkt.im),
        jnp.broadcast_to(jnp.asarray(capture.tx_lptot), (4, 160)),
        jnp.asarray(lp.re + 1j * lp.im),
        mode=EstimatorMode.MATLAB,
    )
    want = rx_cpx.rx_chain(
        jnp.asarray(capture.tx_packet), jnp.asarray(capture.rx_packet),
        jnp.asarray(capture.tx_lptot), jnp.asarray(capture.rx_lptot),
        mode=EstimatorMode.MATLAB,
    )
    # a residual sample of timing offset multiplies the CFR by a known
    # per-bin phase ramp (identical on preamble and data) — the channel
    # MAGNITUDE estimate must be preserved; phase-ramp sensitivity of the
    # 4-pilot interpolators under residual timing is an estimator
    # property, not detection's (LT-LS is per-bin and ramp-proof)
    got_mag = np.abs(np.asarray(out.h_lt))
    want_mag = np.abs(np.asarray(want.h_lt))
    # early (cyclic) extraction preserves magnitudes up to two physical
    # residuals of this real capture: the channel transient occupying the
    # first CP samples (non-cyclic energy from whatever preceded the
    # recorded preamble) and the 20 kHz CFO's ICI pattern re-sampled at
    # the shifted window (measured: 2.6%)
    rel = np.abs(got_mag - want_mag).max() / want_mag.max()
    assert rel < 4e-2, rel


def test_metric_bounded_by_one(capture):
    """Cauchy-Schwarz: the both-window-normalized metric never exceeds 1
    (the single-window form spiked to 1.5 in data regions — fixed)."""
    rng = np.random.default_rng(1)
    frame = np.concatenate([capture.rx_lptot, capture.rx_packet])
    stream = _noise(rng, (2, N), 0.002)
    stream[:, 100:1460] += frame
    m = detect.autocorr_metric(Cplx.from_complex(stream, jnp.float64))
    assert float(np.max(np.asarray(m))) <= 1.0 + 1e-9
