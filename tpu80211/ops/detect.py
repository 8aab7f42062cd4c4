"""Packet detection + timing synchronization from a raw sample stream.

The reference declares ``threshold = 4e-3; % Threshold for signal
detection`` (WiFi_RX.m:7) but contains no detection code — its chain
starts from a pre-extracted packet.  This module implements the stage
that parameter promises, TPU-first (static shapes, cumulative-sum
sliding windows, convolutions on the MXU):

  * **coarse detection** — Schmidl&Cox-style lag-64 normalized
    autocorrelation over the repeated LTS halves:
    M(d) = |Σ_{k<64} r[d+k]·conj(r[d+64+k])|² / (Σ_{k<64} |r[d+64+k]|²)²,
    computed for every offset with two cumulative sums (O(N), no loops);
    a packet is declared where M first exceeds ``threshold`` (the
    plateau over the CP + repeats);
  * **fine timing** — matched filter against the known 64-sample LTS
    (4 real convolutions per complex correlation, `lax.conv`), searched
    in a window around the coarse hit; the LTS repeats give two peaks
    64 samples apart — the earlier is rep-1, so the long-preamble start
    is peak − 32 (its cyclic prefix).

All functions are batched over leading dims and jit-friendly; extraction
uses per-row `dynamic_slice` under `vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu80211 import constants as C
from tpu80211.cplx import Cplx

LAG = C.N_FFT          # 64 — LTS repeat period
WIN = C.N_FFT          # correlation window length
DEFAULT_THRESHOLD = 0.5  # on the normalized metric M ∈ [0, ~1]


def _window_sums(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Sliding sums of length ``w`` along the last axis via cumsum:
    out[d] = Σ_{k<w} x[d+k], shape (..., N-w+1)."""
    c = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([zero, c], axis=-1)
    return c[..., w:] - c[..., :-w]


def autocorr_metric(x: Cplx) -> jnp.ndarray:
    """Normalized lag-64 autocorrelation metric M(d), (..., N-128+1).

    M ≈ 1 over the LTS plateau (signal repeats with period 64), ≈ 0 in
    noise.  Division is guarded for all-zero windows."""
    a = Cplx(x.re[..., :-LAG], x.im[..., :-LAG])
    b = Cplx(x.re[..., LAG:], x.im[..., LAG:])
    prod = a * b.conj()                             # x[d]·conj(x[d+64])
    p_re = _window_sums(prod.re, WIN)
    p_im = _window_sums(prod.im, WIN)
    # normalize by BOTH window energies (Cauchy-Schwarz ⇒ M ≤ 1 always;
    # a single-window normalizer lets energy fluctuations in data/noise
    # push M past any threshold)
    e1 = _window_sums(a.abs2(), WIN)
    e2 = _window_sums(b.abs2(), WIN)
    return (p_re * p_re + p_im * p_im) / jnp.maximum(e1 * e2, 1e-30)


def matched_filter(x: Cplx, ref: Cplx) -> jnp.ndarray:
    """|cross-correlation| of the stream with a known reference,
    (..., N-len(ref)+1).  4 real convolutions (MXU-friendly)."""
    n_ref = ref.shape[-1]
    *lead, n = x.shape
    flat = (-1, 1, n)
    ref = ref.astype(x.dtype)

    def conv(sig, ker):
        # lax.conv is cross-correlation (NN convention, no kernel flip) —
        # exactly corr[d] = Σ_k sig[d+k]·ker[k]
        out = jax.lax.conv_general_dilated(
            sig.reshape(flat),
            ker.reshape(1, 1, n_ref),
            window_strides=(1,), padding="VALID",
        )
        return out.reshape(*lead, -1)

    # corr[d] = Σ x[d+k]·conj(ref[k])
    cr = conv(x.re, ref.re) + conv(x.im, ref.im)
    ci = conv(x.im, ref.re) - conv(x.re, ref.im)
    return jnp.sqrt(cr * cr + ci * ci)


def detect_packet(
    x: Cplx,                     # (..., N) raw sample stream
    lts_ref: Cplx,               # (64,) known time-domain LTS symbol
    threshold: float = DEFAULT_THRESHOLD,
    search: int = 192,
    advance: int = 4,
) -> dict:
    """Detect the packet and return its long-preamble start index.

    Returns dict of (...,)-shaped arrays:
      * ``detected`` — bool, the metric crossed ``threshold`` anywhere;
      * ``coarse``   — first offset where M(d) > threshold;
      * ``start``    — fine lptot start (rep-1 matched-filter peak − 32
        − ``advance``);
      * ``metric``   — the peak M value (quality indicator).

    ``search``: half-width of the fine-search window around the coarse
    hit (the plateau spans CP+128 ≈ 160 samples).  ``advance``: timing
    advance in samples — the matched filter peaks at the channel's bulk
    delay, and extracting LATE costs inter-symbol interference (the FFT
    window borrows samples of the next block) while extracting EARLY by
    up to the cyclic-prefix margin is a pure per-bin phase ramp the
    estimators absorb; biasing a few samples early is the standard
    receiver practice."""
    m = autocorr_metric(x)                          # (..., Nm)
    nm = m.shape[-1]
    above = m > threshold
    detected = jnp.any(above, axis=-1)
    # first crossing: argmax of the boolean (ties → first True)
    coarse = jnp.argmax(above, axis=-1)

    mf = matched_filter(x, lts_ref)                 # (..., Nf)
    # the LTS appears at rep1 and rep2 = rep1 + 64: score each candidate
    # rep1 position by the SUM of both repeat peaks — unambiguous where a
    # single-peak argmax must guess which repeat it found (sidelobes of a
    # dispersive channel can reach ~0.85 of the main peak).  A 5-sample
    # smoothing integrates energy a dispersive channel spreads across
    # neighboring lags before scoring.
    mf_s = _window_sums(mf, 5)                      # centered at d+2
    pair = mf_s[..., :-LAG] + mf_s[..., LAG:]       # (..., Nf-68)
    np_ = pair.shape[-1]
    idx = jnp.arange(np_)
    lo = coarse[..., None]
    mask = (idx >= lo) & (idx < lo + 2 * search)
    rep1 = jnp.argmax(jnp.where(mask, pair, 0.0), axis=-1) + 2
    start = rep1 - 32 - advance                     # lptot = [32-CP|rep|rep]

    idx_m = jnp.arange(nm)
    mask_m = (idx_m >= lo) & (idx_m < lo + 2 * search)
    peak_m = jnp.max(jnp.where(mask_m, m, 0.0), axis=-1)
    # no crossing ⇒ argmax over an all-False mask would yield plausible
    # garbage indices; force -1 so an ungated caller fails loudly
    # (extract_packet clips -1 to 0 — still gate on `detected`)
    return {
        "detected": detected,
        "coarse": jnp.where(detected, coarse, -1),
        "start": jnp.where(detected, start, -1),
        "metric": peak_m,
    }


def extract_packet(x: Cplx, start: jnp.ndarray) -> tuple[Cplx, Cplx]:
    """Slice (lptot (…,160), packet (…,1200)) at per-row ``start`` from a
    (B, N) stream (dynamic_slice under vmap; jit-friendly)."""
    total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES

    def one(row_re, row_im, s):
        s = jnp.clip(s, 0, row_re.shape[-1] - total)
        fr = jax.lax.dynamic_slice(row_re, (s,), (total,))
        fi = jax.lax.dynamic_slice(row_im, (s,), (total,))
        return fr, fi

    fr, fi = jax.vmap(one)(x.re, x.im, start)
    lp = Cplx(fr[..., : C.PREAMBLE_SAMPLES], fi[..., : C.PREAMBLE_SAMPLES])
    pkt = Cplx(fr[..., C.PREAMBLE_SAMPLES :], fi[..., C.PREAMBLE_SAMPLES :])
    return lp, pkt


def lts_time_symbol(tx_lptot) -> Cplx:
    """The known 64-sample LTS symbol from a (…,160) transmit preamble
    (one clean repeat — the matched-filter reference)."""
    if isinstance(tx_lptot, Cplx):
        return Cplx(tx_lptot.re[..., -C.N_FFT :], tx_lptot.im[..., -C.N_FFT :])
    import numpy as np

    arr = np.asarray(tx_lptot)
    return Cplx.from_complex(arr[..., -C.N_FFT :])
