"""Fused whole-chain Pallas kernel: packets in → estimates + eq out.

The XLA-composed chain (pipeline/sc.py) is HBM-bound: the (B,15,53)
frequency-domain block tensors are materialized between the extraction
matmuls and the estimator/equalizer elementwise work (~0.8 GB round-trip
at B=32768).  This kernel keeps the *entire* RX chain for a tile of
``LANES`` frames inside VMEM — the only HBM traffic is the time-domain
inputs (~2.8 MB/tile) and the final outputs (~1.8 MB/tile), i.e. the
information-theoretic minimum for the computation.

Layout: **lane-major** — the frame/batch axis is the last (128-wide lane)
dimension, so every scalar step of the per-frame math is a 128-lane VPU op
and the per-block 64-point DFTs are (53,64)@(64,128) MXU matmuls.  A
production receiver would write its ADC stream in this layout directly;
`fused_rx_chain` accepts the standard batch-major layout and transposes at
the boundary (that transpose costs one extra pass over the inputs — use
`fused_rx_chain_lane_major` to avoid it).

Numerics match pipeline/sc.py MATH mode with the PS-Linear equalizer
blend (WiFi_RX.m:60); estimator math runs f32 regardless of storage dtype.
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
from tpu80211.ops import specmats
from tpu80211.ops.interp import interp_matrix

LANES = 128
_P0, _P1, _P2, _P3 = C.PILOT_IDX


def _row_mask(n, row):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == row


def _kernel(
    # inputs, each (dim, LANES) f32 VMEM refs
    txp_r, txp_i, rxp_r, rxp_i, txl_r, txl_i, rxl_r, rxl_i,
    wre_ref, wim_ref,   # (64, 53) block-DFT planes
    winterp_ref,        # (4, 53, 4) stacked interp matrices (lin/cub/sinc/spl)
    eps_ref,            # (1, 1) SMEM scalar: inputs scaled by (1+eps) on load
    # outputs
    hlt_r, hlt_i, hlin_r, hlin_i, hcub_r, hcub_i, hsin_r, hsin_i,
    hspl_r, hspl_i, hmmse_r, hmmse_i, eq_r, eq_i, ow2_out, chk_out,
):
    f32 = jnp.float32
    # Input perturbation fused into the load (bench serialization hook —
    # a Pallas call is a fusion barrier, so scaling OUTSIDE the kernel
    # costs a whole extra HBM pass over the inputs).  eps=0 ⇒ exact ×1.0.
    scale = 1.0 + eps_ref[0, 0]
    # bf16 storage: feed the DFT matmuls bf16 operands directly — the MXU
    # multiplies bf16 natively in one pass (f32 operands cost a multi-pass
    # decomposition), and a bf16-rounded twiddle adds ~2⁻⁸ relative error,
    # the same order the bf16 inputs already carry.  The perturbation
    # scale commutes with the (linear) DFT, so it is applied to the (53,L)
    # outputs instead of the (64,L) inputs — in f32 either way.
    bf16_mxu = txp_r.dtype == jnp.bfloat16
    mxu_dtype = jnp.bfloat16 if bf16_mxu else f32
    wre = wre_ref[:].astype(mxu_dtype)  # (64, 53)
    wim = wim_ref[:].astype(mxu_dtype)

    def dft(xr, xi, out_scale=None):
        """(64, L) time samples → (53, L) f32 spectrum: y = scale·Wᵀ·x."""
        yr = jnp.dot(wre.T, xr, preferred_element_type=f32) - jnp.dot(
            wim.T, xi, preferred_element_type=f32
        )
        yi = jnp.dot(wre.T, xi, preferred_element_type=f32) + jnp.dot(
            wim.T, xr, preferred_element_type=f32
        )
        if out_scale is not None:
            yr = yr * out_scale
            yi = yi * out_scale
        return yr, yi

    # -- preambles: average the two LTS repeats (f32), DFT -------------------
    def preamble(lr, li):
        ar = ((lr[32:96, :].astype(f32) + lr[96:160, :].astype(f32)) * 0.5)
        ai = ((li[32:96, :].astype(f32) + li[96:160, :].astype(f32)) * 0.5)
        return dft(ar.astype(mxu_dtype), ai.astype(mxu_dtype), scale)

    tpre_r, tpre_i = preamble(txl_r[:], txl_i[:])
    rpre_r, rpre_i = preamble(rxl_r[:], rxl_i[:])
    # noise estimate reads the scaled f32 view of the rx preamble (cheap:
    # (160,L) only)
    rxl_r_all = rxl_r[:].astype(f32) * scale
    rxl_i_all = rxl_i[:].astype(f32) * scale

    # noise power σ² = Σ|rep2−rep1|²/(2·64) (WiFi_RX.m:31)
    dr = rxl_r_all[32:96, :] - rxl_r_all[96:160, :]
    di = rxl_i_all[32:96, :] - rxl_i_all[96:160, :]
    ow2 = jnp.sum(dr * dr + di * di, axis=0, keepdims=True) / (2.0 * C.N_FFT)
    ow2_out[:] = ow2

    # -- LT-LS ----------------------------------------------------------------
    dc = _row_mask(C.N_SC, C.DC_IDX)  # (53, 1)
    denom = tpre_r * tpre_r + tpre_i * tpre_i
    denom = jnp.where(dc, 1.0, denom)
    hlt_re = (tpre_r * rpre_r + tpre_i * rpre_i) / denom
    hlt_im = (tpre_r * rpre_i - tpre_i * rpre_r) / denom
    hlt_re = jnp.where(dc, 0.0, hlt_re)
    hlt_im = jnp.where(dc, 0.0, hlt_im)
    hlt_r[:] = hlt_re
    hlt_i[:] = hlt_im

    # per-lane checksum over every output (bench fence: reading (1,B)
    # instead of re-reading all outputs from HBM to reduce them)
    chk = ow2 + jnp.sum(hlt_re + hlt_im, axis=0, keepdims=True)

    # -- per-block spectra + pilot ratios ------------------------------------
    # slice the packet refs per block in storage dtype; the DFT consumes
    # them directly (bf16 MXU path skips the materialized f32 upcast)
    blocks = []  # (txr, txi, rxr, rxi) per block, each (53, L) f32
    for b in range(C.N_BLOCKS):
        lo = b * C.SAMP_PER_BLOCK + C.N_CP
        hi = lo + C.N_FFT
        tb = dft(txp_r[lo:hi, :].astype(mxu_dtype),
                 txp_i[lo:hi, :].astype(mxu_dtype), scale)
        rb = dft(rxp_r[lo:hi, :].astype(mxu_dtype),
                 rxp_i[lo:hi, :].astype(mxu_dtype), scale)
        blocks.append((tb[0], tb[1], rb[0], rb[1]))

    def cdiv(ar, ai, br, bi):
        d = br * br + bi * bi
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d

    # pilot ratios for the first N_AVG_BLOCKS blocks: (4, L) each
    hp = []
    for b in range(C.N_AVG_BLOCKS):
        tbr, tbi, rbr, rbi = blocks[b]
        pr, pi_ = [], []
        for p in (_P0, _P1, _P2, _P3):
            qr, qi = cdiv(rbr[p : p + 1, :], rbi[p : p + 1, :],
                          tbr[p : p + 1, :], tbi[p : p + 1, :])
            pr.append(qr)
            pi_.append(qi)
        hp.append((jnp.concatenate(pr, axis=0), jnp.concatenate(pi_, axis=0)))

    # -- interpolators: H = Wᵀ(53,4) @ hp(4,L), averaged over blocks ----------
    def interp(idx, out_r, out_i):
        w = winterp_ref[idx]  # (53, 4)
        acc_r = jnp.zeros((C.N_SC, LANES), f32)
        acc_i = jnp.zeros((C.N_SC, LANES), f32)
        for b in range(C.N_AVG_BLOCKS):
            acc_r = acc_r + jnp.dot(w, hp[b][0], preferred_element_type=f32)
            acc_i = acc_i + jnp.dot(w, hp[b][1], preferred_element_type=f32)
        out_r[:] = acc_r / C.N_AVG_BLOCKS
        out_i[:] = acc_i / C.N_AVG_BLOCKS
        return acc_r / C.N_AVG_BLOCKS, acc_i / C.N_AVG_BLOCKS

    hlin_re, hlin_im = interp(0, hlin_r, hlin_i)
    hcub = interp(1, hcub_r, hcub_i)
    hsin = interp(2, hsin_r, hsin_i)
    hspl = interp(3, hspl_r, hspl_i)
    for hr, hi in ((hlin_re, hlin_im), hcub, hsin, hspl):
        chk = chk + jnp.sum(hr + hi, axis=0, keepdims=True)

    # -- MMSE (MATH mode, rank-1 closed form; v = H_LT exactly) ---------------
    acc_r = jnp.zeros((C.N_SC, LANES), f32)
    acc_i = jnp.zeros((C.N_SC, LANES), f32)
    for b in range(C.N_AVG_BLOCKS):
        tbr, tbi, rbr, rbi = blocks[b]
        ur = tbr * hlt_re - tbi * hlt_im
        ui = tbr * hlt_im + tbi * hlt_re
        den = ow2 + jnp.sum(ur * ur + ui * ui, axis=0, keepdims=True)  # (1,L)
        # uᴴ·rx
        sr = jnp.sum(ur * rbr + ui * rbi, axis=0, keepdims=True) / den
        si = jnp.sum(ur * rbi - ui * rbr, axis=0, keepdims=True) / den
        acc_r = acc_r + (hlt_re * sr - hlt_im * si)
        acc_i = acc_i + (hlt_re * si + hlt_im * sr)
    hmmse_r[:] = acc_r / C.N_AVG_BLOCKS
    hmmse_i[:] = acc_i / C.N_AVG_BLOCKS
    chk = chk + jnp.sum(acc_r + acc_i, axis=0, keepdims=True) / C.N_AVG_BLOCKS

    # -- equalize with the PS-Linear blend (WiFi_RX.m:60) ---------------------
    n = C.N_BLOCKS
    for b in range(n):
        _, _, rbr, rbi = blocks[b]
        w_ps = (b + 1) / n
        w_lt = (n - (b + 1)) / n
        hur = w_lt * hlt_re + w_ps * hlin_re
        hui = w_lt * hlt_im + w_ps * hlin_im
        hur = jnp.where(dc, 1.0, hur)
        hui = jnp.where(dc, 0.0, hui)
        er, ei = cdiv(rbr, rbi, hur, hui)
        er = jnp.where(dc, 0.0, er)
        ei = jnp.where(dc, 0.0, ei)
        eq_r[b, :, :] = er.astype(eq_r.dtype)
        eq_i[b, :, :] = ei.astype(eq_i.dtype)
        chk = chk + jnp.sum(er + ei, axis=0, keepdims=True)
    chk_out[:] = chk


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_call(txp_r, txp_i, rxp_r, rxp_i, txl_r, txl_i, rxl_r, rxl_i,
                eps, interpret):
    ntile = txp_r.shape[-1] // LANES
    wre, wim = specmats.block_dft()

    def vspec(dim):
        return pl.BlockSpec((dim, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((C.N_FFT, C.N_SC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    wispec = pl.BlockSpec((4, C.N_SC, 4), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    epspec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    winterp = jnp.asarray(
        np.stack([interp_matrix(k).T for k in ("linear", "cubic", "sinc", "spline")]),
        jnp.float32,
    )
    sc53 = vspec(C.N_SC)
    out_specs = (
        [sc53] * 12
        + [pl.BlockSpec((C.N_BLOCKS, C.N_SC, LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)] * 2
        + [vspec(1), vspec(1)]
    )
    l = txp_r.shape[-1]
    eq_dtype = txp_r.dtype  # eq keeps the storage dtype (bf16 in, bf16 out)
    sh53 = jax.ShapeDtypeStruct((C.N_SC, l), jnp.float32)
    out_shape = (
        [sh53] * 12
        + [jax.ShapeDtypeStruct((C.N_BLOCKS, C.N_SC, l), eq_dtype)] * 2
        + [jax.ShapeDtypeStruct((1, l), jnp.float32)] * 2
    )
    return pl.pallas_call(
        _kernel,
        grid=(ntile,),
        in_specs=[vspec(C.PACKET_SAMPLES)] * 4
        + [vspec(C.PREAMBLE_SAMPLES)] * 4
        + [wspec, wspec, wispec, epspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        txp_r, txp_i, rxp_r, rxp_i, txl_r, txl_i, rxl_r, rxl_i,
        jnp.asarray(wre, jnp.float32), jnp.asarray(wim, jnp.float32), winterp,
        jnp.reshape(jnp.asarray(eps, jnp.float32), (1, 1)),
    )


def fused_rx_chain_lane_major(tx_pkt: Cplx, rx_pkt: Cplx,
                              tx_lp: Cplx, rx_lp: Cplx, eps=0.0):
    """Lane-major entry: packets (1200, B), preambles (160, B); B must be
    a multiple of LANES.  Returns a dict of lane-major outputs:
    h_* (53, B) Cplx, eq (15, 53, B) Cplx, ow2 (B,), checksum (B,).

    ``eps``: inputs are scaled by (1+eps) inside the kernel on load —
    the bench's serialization perturbation, fused so it costs no extra
    HBM pass.  eps=0.0 multiplies by exactly 1.0 (bit-exact no-op).
    ``checksum`` is a per-frame sum over every produced output, so a
    (B,)-sized readback fences the entire computation."""
    b = tx_pkt.shape[-1]
    assert b % LANES == 0, (
        f"lane-major batch {b} must be a multiple of {LANES} — the grid "
        "would silently skip the remainder lanes; use fused_rx_chain for "
        "arbitrary batch sizes"
    )
    outs = _fused_call(
        tx_pkt.re, tx_pkt.im, rx_pkt.re, rx_pkt.im,
        tx_lp.re, tx_lp.im, rx_lp.re, rx_lp.im, eps,
        interpret=not on_tpu(),
    )
    (hlt_r, hlt_i, hlin_r, hlin_i, hcub_r, hcub_i, hsin_r, hsin_i,
     hspl_r, hspl_i, hmm_r, hmm_i, eq_r, eq_i, ow2, chk) = outs
    return {
        "h_lt": Cplx(hlt_r, hlt_i),
        "h_linear": Cplx(hlin_r, hlin_i),
        "h_cubic": Cplx(hcub_r, hcub_i),
        "h_sinc": Cplx(hsin_r, hsin_i),
        "h_spline": Cplx(hspl_r, hspl_i),
        "h_mmse": Cplx(hmm_r, hmm_i),
        "eq": Cplx(eq_r, eq_i),
        "ow2": ow2[0],
        "checksum": chk[0],
    }


def fused_rx_chain(tx_pkt: Cplx, rx_pkt: Cplx, tx_lp: Cplx, rx_lp: Cplx):
    """Batch-major wrapper: packets (B, 1200), preambles (B, 160).

    Pads B to a LANES multiple and transposes at the boundary (one extra
    pass over inputs/outputs — prefer the lane-major entry in production).
    Returns outputs in batch-major layout matching sc.RxOutputs fields.
    """
    b = tx_pkt.shape[0]
    bpad = -(-b // LANES) * LANES

    def prep(x: Cplx) -> Cplx:
        re = jnp.pad(x.re, ((0, bpad - b), (0, 0))).T
        im = jnp.pad(x.im, ((0, bpad - b), (0, 0))).T
        return Cplx(re, im)

    out = fused_rx_chain_lane_major(prep(tx_pkt), prep(rx_pkt),
                                    prep(tx_lp), prep(rx_lp))
    res = {}
    for k, v in out.items():
        if k in ("ow2", "checksum"):
            res[k] = v[:b]
        elif k == "eq":
            res[k] = Cplx(jnp.transpose(v.re, (2, 0, 1))[:b],
                          jnp.transpose(v.im, (2, 0, 1))[:b])
        else:
            res[k] = Cplx(v.re.T[:b], v.im.T[:b])
    return res
