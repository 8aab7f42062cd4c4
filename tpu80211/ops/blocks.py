"""Time-domain → frequency-domain frame processing.

Implements the MATLAB RX front end (the only full chain in the reference):
  * OFDM block extraction — per block take 80 samples, drop the 16-sample
    cyclic prefix, FFT-64, fftshift via circshift(·,26), keep the first 53
    bins (WiFi_blocks_extraction.m:5-10);
  * long-training preamble processing — average the two 64-sample LTS
    repeats, FFT-64, same shift/truncation (WiFi_RX.m:19-29);
  * noise-power estimate σ² from the LTS repeat difference (WiFi_RX.m:31).

All functions broadcast over arbitrary leading batch dims and are jit/shard
friendly (static shapes, no Python control flow on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu80211 import constants as C


def extract_blocks(packet: jnp.ndarray) -> jnp.ndarray:
    """(..., 1200) time-domain packet → (..., 15, 53) frequency-domain symbols.

    Matches WiFi_blocks_extraction.m: CP-strip, FFT-64, circshift by 26,
    truncate to 53 used subcarriers.
    """
    *lead, n = packet.shape
    assert n == C.PACKET_SAMPLES, packet.shape
    blocks = packet.reshape(*lead, C.N_BLOCKS, C.SAMP_PER_BLOCK)[..., C.N_CP :]
    spec = jnp.fft.fft(blocks, n=C.N_FFT, axis=-1)
    spec = jnp.roll(spec, C.FFT_SHIFT, axis=-1)
    return spec[..., : C.N_SC]


def preamble_fft(lptot: jnp.ndarray) -> jnp.ndarray:
    """(..., 160) long-training preamble → (..., 53) averaged LTS spectrum.

    WiFi_RX.m:19-29 — average the last two 64-sample repeats, FFT, shift,
    truncate.
    """
    *lead, n = lptot.shape
    assert n == C.PREAMBLE_SAMPLES, lptot.shape
    rep1 = lptot[..., -C.N_FFT :]
    rep2 = lptot[..., -2 * C.N_FFT : -C.N_FFT]
    avg = (rep1 + rep2) / 2
    spec = jnp.roll(jnp.fft.fft(avg, n=C.N_FFT, axis=-1), C.FFT_SHIFT, axis=-1)
    return spec[..., : C.N_SC]


def noise_power_estimate(rx_lptot: jnp.ndarray) -> jnp.ndarray:
    """σ² = Σ|rep2 − rep1|² / (2K) from the received LTS (WiFi_RX.m:31)."""
    rep1 = rx_lptot[..., -C.N_FFT :]
    rep2 = rx_lptot[..., -2 * C.N_FFT : -C.N_FFT]
    d = rep2 - rep1
    return jnp.sum((d * jnp.conj(d)).real, axis=-1) / (2 * C.N_FFT)
