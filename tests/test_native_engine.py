"""Native C++ data engine (native/dataengine.cpp) — structure, determinism,
time-domain synthesis, and stream integration.

The engine is the host-side producer of pipeline/stream.py; these tests
gate its *statistics* and geometry against the frame contract the
estimators consume (the JAX generator datasets/synthetic.py is the
distribution twin but uses a different RNG, so no bitwise comparison).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu80211 import constants as C
from tpu80211.datasets import native_engine as ne


@pytest.fixture(scope="module")
def batch():
    fb, tb = ne.generate(192, seed=7, snr_db=40.0, time_domain=True)
    return fb, tb


def test_shapes_and_structure(batch):
    fb, tb = batch
    b = 192
    assert fb.tx_symb.shape == (b, C.N_BLOCKS, C.N_SC)
    assert fb.rx_symb.shape == (b, C.N_BLOCKS, C.N_SC)
    assert fb.tx_preamble_fft.shape == (b, C.N_SC)
    assert tb.tx_pkt.shape == (b, C.PACKET_SAMPLES)
    assert tb.tx_lp.shape == (b, C.PREAMBLE_SAMPLES)
    # pilots +1, DC empty, unit-modulus QPSK data (synthetic.py contract)
    tx = fb.tx_symb
    assert np.allclose(tx[:, :, list(C.PILOT_IDX)], 1.0)
    assert np.allclose(tx[:, :, C.DC_IDX], 0.0)
    assert np.allclose(np.abs(tx[:, :, C.DATA_MASK]), 1.0, atol=1e-6)
    # preamble is the shared ±1 LTS
    lts = fb.tx_preamble_fft
    assert np.allclose(lts, lts[:1])
    assert np.allclose(np.abs(np.delete(lts[0], C.DC_IDX)), 1.0, atol=1e-6)


def test_noise_power_matches_snr(batch):
    fb, _ = batch
    resid = fb.rx_symb - fb.tx_symb * fb.h_true[:, None, :]
    sigma2 = 10.0 ** (-40.0 / 10.0)
    ratio = float(np.mean(np.abs(resid) ** 2)) / sigma2
    assert 0.9 < ratio < 1.1, ratio
    assert np.allclose(fb.ow2, sigma2, rtol=1e-6)


def test_channel_unit_power(batch):
    fb, _ = batch
    # unit-total-power PDP ⇒ E|H(k)|² = 1 on every bin
    p = float(np.mean(np.abs(fb.h_true) ** 2))
    assert 0.8 < p < 1.2, p


def test_deterministic_across_threads_and_partitions():
    a = ne.generate(64, seed=11, frame0=0, threads=1)
    b = ne.generate(64, seed=11, frame0=0, threads=8)
    assert np.array_equal(a.rx_symb, b.rx_symb)
    assert np.array_equal(a.h_true, b.h_true)
    # frame i depends only on (seed, frame0+i): resume/replay property
    tail = ne.generate(32, seed=11, frame0=32)
    assert np.array_equal(a.rx_symb[32:], tail.rx_symb)
    # different seed ⇒ different frames
    other = ne.generate(64, seed=12, frame0=0)
    assert not np.array_equal(a.rx_symb, other.rx_symb)


def test_time_domain_is_right_inverse_of_extraction(batch):
    """synthesize (C++) then extract (JAX) recovers the spectra exactly —
    the same contract synthetic.synthesize_time satisfies."""
    from tpu80211.ops import blocks

    fb, tb = batch
    ext = np.asarray(
        blocks.extract_blocks(jnp.asarray(tb.tx_pkt.to_complex(), jnp.complex64))
    )
    assert np.max(np.abs(ext - fb.tx_symb)) < 2e-5
    pre = np.asarray(
        blocks.preamble_fft(jnp.asarray(tb.rx_lp.to_complex(), jnp.complex64))
    )
    assert np.max(np.abs(pre - fb.rx_preamble_fft)) < 2e-5


def test_estimators_recover_channel(batch):
    """LT-LS on engine frames reaches the 40 dB noise floor — the engine's
    (tx, rx, h) triple is self-consistent."""
    from tpu80211.models.lt_ls import lt_ls

    fb, _ = batch
    h = np.asarray(
        lt_ls(jnp.asarray(fb.tx_preamble_fft), jnp.asarray(fb.rx_preamble_fft))
    )
    mask = np.ones(C.N_SC, bool)
    mask[C.DC_IDX] = False
    nmse = np.mean(np.abs(h[:, mask] - fb.h_true[:, mask]) ** 2) / np.mean(
        np.abs(fb.h_true[:, mask]) ** 2
    )
    assert nmse < 1e-3, nmse


def test_cfo_rotation_matches_jax_semantics():
    """fo_hz rotates block b by exp(2πi·fo·80·b/fs) (synthetic.py:134-139)."""
    base = ne.generate(8, seed=3, snr_db=200.0)  # noiseless
    rot = ne.generate(8, seed=3, snr_db=200.0, fo_hz=20e3)
    ang = 2.0 * np.pi * 20e3 * C.SAMP_PER_BLOCK / 20e6
    expect = base.rx_symb * np.exp(1j * ang * np.arange(C.N_BLOCKS))[None, :, None]
    assert np.max(np.abs(rot.rx_symb - expect)) < 1e-5


def test_stream_with_native_engine(tmp_path):
    from tpu80211.pipeline import stream

    res = stream.run_stream(
        stream.synthetic_batches(3, 16, seed=5, engine="native"),
        out_dir=str(tmp_path / "shards"),
    )
    assert res["frames"] == 48
    assert res["batches"] == 3
    # resume skips completed shards
    res2 = stream.run_stream(
        stream.synthetic_batches(3, 16, seed=5, engine="native"),
        out_dir=str(tmp_path / "shards"),
    )
    assert res2["batches"] == 0


def test_native_time_batches_feed_sc_chain():
    """The time-domain producer drives the split-complex full chain."""
    import jax

    from tpu80211.pipeline import sc, stream

    (args,) = list(stream.native_time_batches(1, 8, seed=9))
    out = jax.jit(sc.rx_chain)(*args)
    assert out.h_mmse.shape == (8, C.N_SC)
    assert np.all(np.isfinite(out.h_mmse.re))
