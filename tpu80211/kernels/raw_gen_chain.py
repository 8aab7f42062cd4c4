"""Fully generative raw-system kernel: synthesize → detect → estimate,
all inside ONE Pallas invocation.

The gen="raw" stream (pipeline/stream.py) synthesizes raw sample streams
with XLA (IDFT assembly + placement kernel + rbg noise) and feeds the
one-kernel raw receiver — ~6.5 ms/batch at B=32768, generation-bound.
This kernel is that system's speed-of-light form, the raw-stream
analogue of kernels/gen_chain.py: per 128-stream tile it

  1. draws a fresh channel (exponential/ETSI PDP taps, hardware PRNG,
     Box-Muller over the bitcast-polynomial ln of gen_chain);
  2. synthesizes the time-domain frame in VMEM (per-block IDFT matmuls
     + cyclic prefixes + the [32|64|64] long preamble);
  3. draws a per-stream random offset and places the frame with the
     inverse barrel shifter; adds full-field AWGN;
  4. runs detection (decimated Schmidl&Cox + MXU matched filter), the
     extraction barrel shifter, and the full tx-constant chain body
     (kernels/fused_chain._kernel) with in-kernel per-stream
     Σ|eq − tx|² — NOTHING but summaries, sampled estimates, and the
     ground truth leave the chip, and nothing is read from it.

Outputs: detection rows (detected/start/metric), the TRUE offsets and
CFR (ground truth for scoring), h_wiener/h_mmse at batch width, per-
stream evm_sums, σ̂², CFO row, checksum (the stream's state carrier).
Deterministic per (seed, tile); statistically identical to the XLA
generation path (different PRNG bit streams).

On non-TPU backends `gen_raw_system` falls back to the XLA generator +
staged receiver composition (same distributions and math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu80211 import constants as C
from tpu80211.cplx import Cplx
from tpu80211.kernels import on_tpu
from tpu80211.kernels import detect_kernel as dk
from tpu80211.kernels import fused_chain as fc
from tpu80211.kernels.gen_chain import _cfr_mats, _fast_log

LANES = fc.LANES
_TWO_PI = 2.0 * np.pi


@functools.lru_cache(maxsize=None)
def _idft_mats():
    """(64, 53) split-plane matrix t = V @ spec mapping the 53 used bins
    (fftshifted order, DC at index 26) to 64 time samples — the exact
    right-inverse of ops/specmats.block_dft's extraction map."""
    k = (np.arange(C.N_SC) - C.FFT_SHIFT) % C.N_FFT
    n = np.arange(C.N_FFT)
    v = np.exp(2j * np.pi * np.outer(n, k) / C.N_FFT) / C.N_FFT
    return (np.ascontiguousarray(v.real, np.float32),
            np.ascontiguousarray(v.imag, np.float32))


def _gen_raw_kernel(txs_r, txs_i, tpc_r, tpc_i, vre_ref, vim_ref,
                    wcr_ref, wci_ref, wrr_ref, wri_ref,
                    wre_ref, wim_ref, winre_ref, winim_ref,
                    eps_ref, lsb_ref, seed_ref,
                    det_out, start_out, metric_out, offs_out,
                    htr_out, hti_out, cfo_true_out,
                    *chain_outs, ns, snr_db, rms, n_taps,
                    threshold, search, advance,
                    equalize_with="h_linear", cfo_khz=0.0):
    f32 = jnp.float32
    pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))

    def normals(n):
        """Two (n, LANES) standard normals (Box-Muller, hardware PRNG,
        bitcast-polynomial ln — gen_chain's recipe)."""
        b1 = pltpu.prng_random_bits((n, LANES))
        b2 = pltpu.prng_random_bits((n, LANES))
        u1 = (jax.lax.shift_right_logical(b1, 8).astype(jnp.int32)
              .astype(f32)) * (2.0 ** -24) + (2.0 ** -25)
        u2 = (jax.lax.shift_right_logical(b2, 8).astype(jnp.int32)
              .astype(f32)) * (2.0 ** -24)
        r = jnp.sqrt(jnp.maximum(-2.0 * _fast_log(u1), 0.0))
        th = _TWO_PI * u2
        return r * jnp.cos(th), r * jnp.sin(th)

    # ---- channel: PDP taps → CFR on the MXU (gen_chain recipe) --------
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (n_taps, 1), 0).astype(f32)
    psum = float(np.exp(-np.arange(n_taps) / rms).sum())
    tscale = jnp.sqrt(jnp.exp(-l_idx / rms) / (2.0 * psum))
    t_re, t_im = normals(n_taps)
    t_re = t_re * tscale
    t_im = t_im * tscale
    wcr = wcr_ref[:]
    wci = wci_ref[:]
    h_re = jnp.dot(wcr, t_re, preferred_element_type=f32) - jnp.dot(
        wci, t_im, preferred_element_type=f32)
    h_im = jnp.dot(wcr, t_im, preferred_element_type=f32) + jnp.dot(
        wci, t_re, preferred_element_type=f32)
    htr_out[:] = h_re
    hti_out[:] = h_im

    # ---- time-domain synthesis in VMEM --------------------------------
    vre = vre_ref[:]                                # (64, 53) IDFT
    vim = vim_ref[:]

    def idft(sr, si):                               # (53, L) → (64, L)
        tr = jnp.dot(vre, sr, preferred_element_type=f32) - jnp.dot(
            vim, si, preferred_element_type=f32)
        ti = jnp.dot(vre, si, preferred_element_type=f32) + jnp.dot(
            vim, sr, preferred_element_type=f32)
        return tr, ti

    # long preamble [last 32 | rep | rep]
    p64r, p64i = idft(tpc_r[:] * h_re - tpc_i[:] * h_im,
                      tpc_r[:] * h_im + tpc_i[:] * h_re)
    pieces_r = [p64r[-32:], p64r, p64r]
    pieces_i = [p64i[-32:], p64i, p64i]
    # data blocks [CP | 64] × 15
    for b in range(C.N_BLOCKS):
        tbr = txs_r[:, b:b + 1]
        tbi = txs_i[:, b:b + 1]
        sr = tbr * h_re - tbi * h_im
        si = tbr * h_im + tbi * h_re
        tr, ti = idft(sr, si)
        pieces_r += [tr[-C.N_CP:], tr]
        pieces_i += [ti[-C.N_CP:], ti]
    total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES
    pieces_r.append(jnp.zeros((ns - total, LANES), f32))
    pieces_i.append(jnp.zeros((ns - total, LANES), f32))
    sig_r = jnp.concatenate(pieces_r, axis=0)       # (ns, L)
    sig_i = jnp.concatenate(pieces_i, axis=0)

    # ---- per-stream offset + placement + full-field noise -------------
    span = ns - total - 40
    obits = jnp.bitwise_and(
        pltpu.prng_random_bits((1, LANES)).astype(jnp.int32), 0x7FFFFFFF)
    offs = 40 + jnp.remainder(obits, span)          # (1, L) in [40, ns-1360)
    offs_out[:] = offs
    # packed-int32 placement on bf16 planes (~half the f32 passes, and
    # offs < ns-total needs only ceil(log2(ns-total)) bits, not
    # ceil(log2 ns)).  Quantizing the CLEAN signal to bf16 here models
    # the production input path — the receiver's raw streams are bf16
    # sample words — and sits ~10 dB below the SNR-40 noise floor.
    nbits = max(1, int(np.ceil(np.log2(ns - total))))
    sig_bf_r, sig_bf_i = dk._barrel_place_packed(
        sig_r.astype(jnp.bfloat16), sig_i.astype(jnp.bfloat16),
        offs, ns, nbits=nbits)
    sig_r = sig_bf_r.astype(f32)
    sig_i = sig_bf_i.astype(f32)

    # per-stream carrier-frequency offset (the impairment the reference's
    # capture carries at 20 kHz, WiFi_RX.m:9): uniform in ±cfo_khz,
    # applied as a phase ramp over the whole waveform — recovered by the
    # chain's in-kernel Moose CFO + pilot CPE stages (sync=True)
    if cfo_khz > 0.0:
        fb = pltpu.prng_random_bits((1, LANES))
        u = (jax.lax.shift_right_logical(fb, 8).astype(jnp.int32)
             .astype(f32)) * (2.0 ** -24)
        eps_true = (2.0 * u - 1.0) * np.float32(cfo_khz * 1e3 / 20e6)
        cfo_true_out[:] = eps_true                  # cycles/sample
        n_idx = jax.lax.broadcasted_iota(jnp.int32, (ns, 1), 0).astype(f32)
        ang = _TWO_PI * eps_true * n_idx
        rot_r, rot_i = jnp.cos(ang), jnp.sin(ang)
        sig_r, sig_i = (sig_r * rot_r - sig_i * rot_i,
                        sig_r * rot_i + sig_i * rot_r)
    else:
        cfo_true_out[:] = jnp.zeros((1, LANES), f32)

    sigma_t2 = (10.0 ** (-snr_db / 10.0)) / C.N_FFT
    nsc = np.float32(np.sqrt(sigma_t2 / 2.0))
    n1r, n1i = normals(ns)   # independent Box-Muller pair: re and im
    xr = sig_r + nsc * n1r
    xi = sig_i + nsc * n1i

    # ---- detection + alignment + chain --------------------------------
    det, coarse, start, peak_m = dk._detect_core(
        xr, xi, wrr_ref[:], wri_ref[:], ns=ns, threshold=threshold,
        search=search, advance=advance, decimate=True)
    detected = det > 0
    det_out[:] = det
    start_out[:] = jnp.where(detected, start, -1)
    metric_out[:] = peak_m

    s = jnp.clip(jnp.where(detected, start, 0), 0, ns - total)
    cur_r, cur_i = dk._barrel_align(xr, xi, s, ns)
    bf16 = jnp.bfloat16
    lp_r = cur_r[: C.PREAMBLE_SAMPLES].astype(bf16)
    lp_i = cur_i[: C.PREAMBLE_SAMPLES].astype(bf16)
    pkt_r = cur_r[C.PREAMBLE_SAMPLES : total].astype(bf16)
    pkt_i = cur_i[C.PREAMBLE_SAMPLES : total].astype(bf16)
    fc._kernel(
        txs_r, txs_i, tpc_r, tpc_i, pkt_r, pkt_i, lp_r, lp_i,
        wre_ref, wim_ref, winre_ref, winim_ref, eps_ref, lsb_ref,
        *chain_outs, tx_const=True, sync=(cfo_khz > 0.0), evm_sums=True,
        equalize_with=equalize_with,
    )


@functools.partial(jax.jit, static_argnames=(
    "batch", "ns", "snr_db", "channel_model", "threshold", "search",
    "advance", "equalize_with", "cfo_khz"))
def _gen_raw_call(txs_r, txs_i, tpc_r, tpc_i, wrr, wri, seed,
                  batch, ns, snr_db, channel_model=None,
                  threshold=0.5, search=192, advance=4,
                  equalize_with="h_linear", cfo_khz=0.0):
    from tpu80211.ops import channel

    ntile = batch // LANES
    rms = float(channel.rms_samples(channel_model))
    n_taps = channel.n_taps_for(channel_model)

    def vspec(dim):
        return pl.BlockSpec((dim, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def cspec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    cspecs, consts = fc._const_specs(channel_model, snr_db)
    vre, vim = _idft_mats()
    wcr, wci = _cfr_mats(n_taps)
    chain_specs, chain_shape = fc._out_specs_shapes(
        batch, jnp.bfloat16, serve=True, eq_stub=True, evm_sums=True)
    out_specs = ([vspec(1)] * 4 + [vspec(C.N_SC)] * 2 + [vspec(1)]
                 + list(chain_specs))
    out_shape = (
        [jax.ShapeDtypeStruct((1, batch), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((1, batch), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, batch), jnp.int32)]
        + [jax.ShapeDtypeStruct((C.N_SC, batch), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, batch), jnp.float32)]
        + list(chain_shape)
    )
    # output order: det(i32), start(i32), metric(f32), offs(i32), h_true×2
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_gen_raw_kernel, ns=ns, snr_db=float(snr_db),
                          rms=rms, n_taps=n_taps,
                          threshold=float(threshold), search=int(search),
                          advance=int(advance),
                          equalize_with=equalize_with,
                          cfo_khz=float(cfo_khz)),
        grid=(ntile,),
        in_specs=[cspec(C.N_SC, fc.NB_PAD)] * 2 + [cspec(C.N_SC, 1)] * 2
        + [cspec(C.N_FFT, C.N_SC)] * 2
        + [cspec(C.N_SC, n_taps)] * 2
        + [cspec(dk.LAG, dk.MF_CHUNK)] * 2
        + cspecs + [sspec],
        out_specs=out_specs,
        out_shape=out_shape,
    )(
        txs_r, txs_i, tpc_r, tpc_i,
        jnp.asarray(vre), jnp.asarray(vim),
        jnp.asarray(wcr), jnp.asarray(wci),
        wrr, wri, *consts,
        jnp.zeros((1, 1), jnp.float32),       # eps (state rides the seed)
        jnp.ones((1, 1), jnp.float32),        # lsb
        jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1)),
    )


def gen_raw_system(seed, batch: int, txs: Cplx, tpre: Cplx,
                   lts_ref: Cplx, ns: int = 2048, snr_db: float = 20.0,
                   channel_model: str | None = None,
                   threshold: float = 0.5,
                   equalize_with: str = "h_linear",
                   cfo_khz: float = 0.0) -> dict:
    """Run the fully in-kernel generative raw system for one batch.

    Returns dict: detected (B,) bool, start/offsets (B,) int32, metric,
    h_true (53, B) Cplx, h_wiener/h_mmse (53, B) Cplx, evm_sums (B,),
    ow2/cfo/checksum (B,).  Deterministic per (seed, tile)."""
    assert batch % LANES == 0, (batch, LANES)
    if not on_tpu():
        # statistically identical composition: XLA generator + receiver
        from tpu80211.datasets import synthetic_sc
        from tpu80211.kernels.raw_chain import raw_rx_txconst_fused

        key = jax.random.fold_in(jax.random.PRNGKey(1234),
                                 jnp.asarray(seed, jnp.int32))
        x, h, offs = synthetic_sc.generate_raw_lane_major(
            key, batch, txs, tpre, ns=ns, snr_db=snr_db,
            dtype=jnp.float32, channel_model=channel_model)
        if cfo_khz > 0.0:
            kc = jax.random.fold_in(key, 77)
            f = cfo_khz * 1e3 / 20e6
            eps_true = jax.random.uniform(kc, (batch,), jnp.float32,
                                          minval=-f, maxval=f)
            ang = (2.0 * np.pi * eps_true[None, :]
                   * jnp.arange(ns, dtype=jnp.float32)[:, None])
            cr_, ci_ = jnp.cos(ang), jnp.sin(ang)
            x = Cplx(x.re * cr_ - x.im * ci_, x.re * ci_ + x.im * cr_)
        else:
            eps_true = jnp.zeros((batch,), jnp.float32)
        from tpu80211.pipeline.raw import raw_rx_txconst

        out = raw_rx_txconst(x, lts_ref, txs, tpre, threshold=threshold,
                             serve=True, sync=(cfo_khz > 0.0),
                             equalize_with=equalize_with)
        # match the kernel's stream contract: in-XLA per-stream EVM
        eqs = out["eq"]
        txb_r = jnp.broadcast_to(txs.re[:, :C.N_BLOCKS].T[:, :, None],
                                 eqs.re.shape)
        txb_i = jnp.broadcast_to(txs.im[:, :C.N_BLOCKS].T[:, :, None],
                                 eqs.im.shape)
        d_re = eqs.re.astype(jnp.float32) - txb_r
        d_im = eqs.im.astype(jnp.float32) - txb_i
        out["evm_sums"] = jnp.sum(d_re * d_re + d_im * d_im, axis=(0, 1))
        out["eq"] = None
        out["offsets"] = offs
        out["h_true"] = h
        out["cfo_true"] = eps_true
        return out
    h_re = tuple(float(v) for v in np.asarray(lts_ref.re))
    h_im = tuple(float(v) for v in np.asarray(lts_ref.im))
    wrr, wri = dk._mf_bands((h_re, h_im))
    outs = _gen_raw_call(
        txs.re, txs.im, tpre.re, tpre.im,
        jnp.asarray(wrr), jnp.asarray(wri), seed,
        batch=batch, ns=ns, snr_db=float(snr_db),
        channel_model=channel_model, threshold=float(threshold),
        equalize_with=equalize_with, cfo_khz=float(cfo_khz))
    det, start, metric, offs, htr, hti, cfo_true = outs[:7]
    res = fc._pack_outputs(outs[7:], serve=True, eq_stub=True,
                           evm_sums=True)
    res["cfo_true"] = cfo_true[0]
    res["detected"] = det[0] > 0
    res["start"] = start[0]
    res["metric"] = metric[0]
    res["offsets"] = offs[0]
    res["h_true"] = Cplx(htr, hti)
    return res
