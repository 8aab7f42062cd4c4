"""Synthetic 802.11 frame generator — scales the workload past the single
shipped capture.

The reference's dataset is one frozen frame captured at SNR 40 dB through
MATLAB channel model 'A' with a 20 kHz frequency offset (WiFi_RX.m:4-9);
its MPI frame-group mode replays that same frame on every group
(main_mpi.c:62-93).  To benchmark at 10⁵⁺ concurrent frames the framework
generates random frames with the same geometry:

  * QPSK data symbols on the 48 data subcarriers, BPSK-like pilots on the
    4 pilot subcarriers, DC empty — per OFDM block;
  * a known long-training symbol on all used subcarriers (preamble);
  * an exponential-power-delay-profile FIR channel (channel-model-'A'
    shaped) drawn per frame;
  * AWGN at a configurable SNR.

Everything is generated directly in the frequency domain of the 53 used
subcarriers (the C reference also starts from frequency-domain symbols,
inputs.h:130/928); the time-domain view for the full RX chain is produced
by the exact inverse of the block extraction (zero-pad 53→64, ifft,
prepend CP), so extract_blocks(synthesize_time(x)) == x to rounding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C


class FrameBatch(NamedTuple):
    """A batch of synthetic frames, frequency-domain view.

    All leading dims are the batch; mirrors the fields of
    datasets.loader.Capture that the estimators consume.
    """

    tx_preamble_fft: jnp.ndarray  # (B, 53)
    rx_preamble_fft: jnp.ndarray  # (B, 53)
    tx_symb: jnp.ndarray          # (B, 15, 53)
    rx_symb: jnp.ndarray          # (B, 15, 53)
    ow2: jnp.ndarray              # (B,) per-frame noise power
    h_true: jnp.ndarray           # (B, 53) ground-truth CFR (for MSE metrics)


def _channel_taps(key, batch, channel_model=None, sample_rate_hz=20e6):
    """Exponential power-delay-profile FIR taps, (B, n_taps) complex.

    ``channel_model`` ∈ {None, 'A'..'E'} selects the ETSI BRAN profile
    (ops/channel.py — the reference's WiFi_RX.m:6 parameter surface);
    None keeps the legacy 8-tap rms-2.0-sample profile."""
    from tpu80211.ops import channel

    p = channel.pdp(channel_model, sample_rate_hz)
    kr, ki = jax.random.split(key)
    scale = jnp.asarray(np.sqrt(p / 2.0), jnp.float32)
    re = jax.random.normal(kr, (batch, p.size), jnp.float32) * scale
    im = jax.random.normal(ki, (batch, p.size), jnp.float32) * scale
    return re + 1j * im


def _cfr_from_taps(taps):
    """(B, n_taps) taps → (B, 53) CFR on the shifted 53-bin grid.

    Frequency response evaluated on FFT-64 bins, then fftshifted by 26 and
    truncated to 53 — the same grid as extract_blocks.
    """
    n_taps = taps.shape[-1]
    k = (np.arange(C.N_SC) - C.FFT_SHIFT) % C.N_FFT  # pre-shift bin index
    n = np.arange(n_taps)
    w = np.exp(-2j * np.pi * np.outer(n, k) / C.N_FFT)  # (taps, 53)
    return taps @ jnp.asarray(w, taps.dtype)


@functools.lru_cache(maxsize=None)
def _lts_spectrum() -> np.ndarray:
    """Deterministic ±1 long-training symbol on the 53 used bins, DC = 0.

    (Same role as the 802.11a LTS; exact values don't matter for the
    estimators, only that tx is known and nonzero off DC.)
    """
    rng = np.random.default_rng(0x80211)
    s = rng.integers(0, 2, C.N_SC).astype(np.float64) * 2 - 1
    s[C.DC_IDX] = 0.0
    return s


def generate(
    key, batch: int, snr_db: float = 40.0, dtype=jnp.complex64,
    fo_hz: float = 0.0, sample_rate_hz: float = 20e6,
    channel_model: str | None = None, modulation: str = "qpsk",
) -> FrameBatch:
    """Generate a FrameBatch of ``batch`` random frames at ``snr_db``.

    ``fo_hz`` adds a carrier frequency offset (the shipped capture carries
    20 kHz, WiFi_RX.m:9).  In this frequency-domain generator a constant
    CFO appears as a common per-block phase rotation of
    exp(2πi·fo·80·b/fs) (one OFDM symbol = 80 samples) plus ICI, of which
    the rotation is the dominant term at 20 kHz/20 MHz; only the rotation
    is modeled.  ``channel_model`` ∈ {None, 'A'..'E'}: the ETSI BRAN
    power-delay profile (ops/channel.py; the WiFi_RX.m:6 parameter).
    ``modulation`` ∈ {"qpsk", "qam16", "qam64"}: data-subcarrier
    constellation at unit average power (the reference is QPSK-only).
    """
    k_ch, k_data, k_n1, k_n2, k_n3 = jax.random.split(key, 5)

    h = _cfr_from_taps(
        _channel_taps(k_ch, batch, channel_model, sample_rate_hz)
    ).astype(dtype)  # (B, 53)

    # tx data: M-QAM on all used bins, pilots fixed +1, DC 0
    if modulation == "qpsk":
        bits = jax.random.bernoulli(k_data, 0.5, (batch, C.N_BLOCKS, C.N_SC, 2))
        data = ((bits[..., 0] * 2 - 1) + 1j * (bits[..., 1] * 2 - 1)).astype(dtype)
        data = data / np.sqrt(2.0)
    else:
        from tpu80211.utils.metrics import pam_levels

        m = {"qam16": 16, "qam64": 64}[modulation]
        lv = jnp.asarray(pam_levels(m))
        ki_, kq_ = jax.random.split(k_data)
        i_idx = jax.random.randint(ki_, (batch, C.N_BLOCKS, C.N_SC), 0, lv.size)
        q_idx = jax.random.randint(kq_, (batch, C.N_BLOCKS, C.N_SC), 0, lv.size)
        data = (lv[i_idx] + 1j * lv[q_idx]).astype(dtype)
    pilot = jnp.asarray(C.PILOT_MASK)
    dc = np.zeros((C.N_SC,), bool)
    dc[C.DC_IDX] = True
    tx = jnp.where(pilot, jnp.ones((), dtype), data)
    tx = jnp.where(jnp.asarray(dc), jnp.zeros((), dtype), tx)

    lts = jnp.asarray(_lts_spectrum(), dtype)
    tx_pre = jnp.broadcast_to(lts, (batch, C.N_SC))

    # noise at the target SNR (signal power ≈ 1 per used bin)
    sigma2 = 10.0 ** (-snr_db / 10.0)
    nsc = np.sqrt(sigma2 / 2.0)

    def _noise(k, shape):
        kr, ki = jax.random.split(k)
        return (
            jax.random.normal(kr, shape, jnp.float32)
            + 1j * jax.random.normal(ki, shape, jnp.float32)
        ).astype(dtype) * nsc

    rx = tx * h[:, None, :] + _noise(k_n1, (batch, C.N_BLOCKS, C.N_SC))
    if fo_hz:
        ang = (
            2.0 * np.pi * fo_hz * C.SAMP_PER_BLOCK / sample_rate_hz
        ) * np.arange(C.N_BLOCKS)
        rot = jnp.asarray(np.exp(1j * ang), dtype)[None, :, None]
        rx = rx * rot
    rx_pre = tx_pre * h + _noise(k_n2, (batch, C.N_SC))

    ow2 = jnp.full((batch,), sigma2, jnp.float32)
    return FrameBatch(tx_pre, rx_pre, tx, rx, ow2, h)


def synthesize_preamble_time(pre_fft: jnp.ndarray) -> jnp.ndarray:
    """(…, 53) preamble spectrum → (…, 160) time-domain long preamble.

    Inverse of ops.blocks.preamble_fft up to the repeat average: the
    64-sample LTS is repeated twice behind its last 32 samples as cyclic
    prefix — the 802.11 long-preamble layout (WiFi_RX.m:19-29 reads it
    back as two repeats at offsets 32 and 96).
    """
    *lead, nsc = pre_fft.shape
    assert nsc == C.N_SC, pre_fft.shape
    spec64 = jnp.zeros((*lead, C.N_FFT), pre_fft.dtype)
    spec64 = spec64.at[..., : C.N_SC].set(pre_fft)
    spec64 = jnp.roll(spec64, -C.FFT_SHIFT, axis=-1)
    t = jnp.fft.ifft(spec64, axis=-1)  # (…, 64)
    return jnp.concatenate([t[..., -32:], t, t], axis=-1)


def apply_time_cfo(
    x: jnp.ndarray, eps: float, start: int = 0
) -> jnp.ndarray:
    """Impair a (…, N) time-domain stream with a CFO of ``eps``
    cycles/sample: x[n] · exp(+2πi·eps·(start+n))."""
    n = x.shape[-1]
    t = start + np.arange(n)
    return x * jnp.asarray(np.exp(2j * np.pi * eps * t), x.dtype)


def synthesize_time(symb: jnp.ndarray) -> jnp.ndarray:
    """(…, 15, 53) frequency-domain blocks → (…, 1200) time-domain packet.

    Exact right-inverse of ops.blocks.extract_blocks: zero-pad the 53 used
    bins into the 64-bin shifted grid, inverse-shift, ifft-64, prepend the
    16-sample cyclic prefix.
    """
    *lead, nb, nsc = symb.shape
    assert (nb, nsc) == (C.N_BLOCKS, C.N_SC), symb.shape
    spec64 = jnp.zeros((*lead, nb, C.N_FFT), symb.dtype)
    spec64 = spec64.at[..., : C.N_SC].set(symb)
    spec64 = jnp.roll(spec64, -C.FFT_SHIFT, axis=-1)
    t = jnp.fft.ifft(spec64, axis=-1)
    with_cp = jnp.concatenate([t[..., -C.N_CP :], t], axis=-1)  # (…, 15, 80)
    return with_cp.reshape(*lead, C.PACKET_SAMPLES)
