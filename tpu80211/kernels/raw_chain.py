"""Fully-fused raw receiver kernel: raw streams → estimates, ONE pass.

pipeline/raw.py's staged system (detect+align kernel → chain kernel)
round-trips the 1360 aligned samples per stream through HBM between the
two kernels (~356 MB at B=32768 bf16).  This kernel removes that: for a
tile of 128 streams, detection (kernels/detect_kernel._detect_core),
barrel-shift alignment (._barrel_align) and the full tx-constant chain
(kernels/fused_chain._kernel, whose body is polymorphic over refs and
VMEM values) run in a single Pallas invocation — the raw samples are
read from HBM exactly once and only the estimates leave.

The chain consumes the aligned packet as bf16 VALUES in VMEM (cast back
from the f32 barrel-shift planes), so its DFT matmuls keep the bf16
single-pass MXU path.  Output contract = fused_rx_chain_txconst's dict
plus the detection rows; ``serve=True`` drops the same diagnostic
planes (None).

On non-TPU backends `raw_rx_txconst_fused` falls back to the staged
pipeline (identical math): pipeline/raw.py::raw_rx_txconst.
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
from tpu80211.kernels import fused_chain as fc
from tpu80211.kernels import detect_kernel as dk

LANES = fc.LANES


def _raw_kernel(xr_ref, xi_ref, wrr_ref, wri_ref,
                txs_r, txs_i, tpc_r, tpc_i,
                wre_ref, wim_ref, winre_ref, winim_ref, eps_ref, lsb_ref,
                det_out, coarse_out, start_out, metric_out,
                *chain_outs, ns, threshold, search, advance, sync,
                stream_sums=False, equalize_with="h_linear",
                decimate=True):
    f32 = jnp.float32
    xr = xr_ref[:].astype(f32)
    xi = xi_ref[:].astype(f32)
    # decimated coarse metric: exact strided S&C samples — the fine
    # matched-filter timing (full resolution) is unaffected, and the
    # raw receiver never exposes `coarse`
    det, coarse, start, peak_m = dk._detect_core(
        xr, xi, wrr_ref[:], wri_ref[:], ns=ns, threshold=threshold,
        search=search, advance=advance, decimate=decimate)
    detected = det > 0
    det_out[:] = det
    coarse_out[:] = jnp.where(detected, coarse, -1)
    start_out[:] = jnp.where(detected, start, -1)
    metric_out[:] = peak_m

    total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES
    s = jnp.clip(jnp.where(detected, start, 0), 0, ns - total)
    if xr_ref.dtype == jnp.bfloat16:
        # packed-int32 barrel on the raw bf16 planes — ~half the passes
        cur_r, cur_i = dk._barrel_align_packed(xr_ref[:], xi_ref[:], s, ns)
    elif xr_ref.dtype == jnp.int8:
        # int8 ADC words are exact in bf16 — upcast once and take the
        # packed path (the f32 barrel costs ~2× the passes)
        cur_r, cur_i = dk._barrel_align_packed(
            xr_ref[:].astype(jnp.bfloat16), xi_ref[:].astype(jnp.bfloat16),
            s, ns)
    else:
        cur_r, cur_i = dk._barrel_align(xr, xi, s, ns)
    # hand the chain body bf16 VALUES so its DFTs take the single-pass
    # bf16 MXU path (fused_chain._kernel slices/reads work on values).
    # int8 streams: the integer sample values pass through the f32
    # detection/alignment exactly and land in bf16 exactly; the LSB
    # scale applies inside the chain (scale = (1+eps)·lsb)
    store = jnp.bfloat16 if xr_ref.dtype == jnp.int8 else xr_ref.dtype
    lp_r = cur_r[: C.PREAMBLE_SAMPLES].astype(store)
    lp_i = cur_i[: C.PREAMBLE_SAMPLES].astype(store)
    pkt_r = cur_r[C.PREAMBLE_SAMPLES : total].astype(store)
    pkt_i = cur_i[C.PREAMBLE_SAMPLES : total].astype(store)
    fc._kernel(
        txs_r, txs_i, tpc_r, tpc_i, pkt_r, pkt_i, lp_r, lp_i,
        wre_ref, wim_ref, winre_ref, winim_ref, eps_ref, lsb_ref,
        *chain_outs, tx_const=True, sync=sync, evm_sums=stream_sums,
        equalize_with=equalize_with,
    )


@functools.partial(jax.jit, static_argnames=(
    "threshold", "search", "advance", "sync", "serve",
    "wiener_model", "wiener_snr_db", "stream_sums", "equalize_with",
    "decimate"))
def _raw_call(xr, xi, wrr, wri, txs_r, txs_i, tpc_r, tpc_i, eps,
              threshold, search, advance, sync=False, serve=False,
              wiener_model=None, wiener_snr_db=None, lsb=1.0,
              stream_sums=False, equalize_with="h_linear", decimate=True):
    ns, b = xr.shape
    ntile = b // LANES

    def vspec(dim):
        return pl.BlockSpec((dim, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((dk.LAG, dk.MF_CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((C.N_SC, fc.NB_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((C.N_SC, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    cspecs, consts = fc._const_specs(wiener_model, wiener_snr_db)
    eq_dtype = jnp.bfloat16 if xr.dtype == jnp.int8 else xr.dtype
    chain_specs, chain_shape = fc._out_specs_shapes(
        b, eq_dtype, serve=serve, eq_stub=stream_sums,
        evm_sums=stream_sums)
    out_specs = [vspec(1)] * 4 + list(chain_specs)
    out_shape = (
        [jax.ShapeDtypeStruct((1, b), jnp.int32)] * 3
        + [jax.ShapeDtypeStruct((1, b), jnp.float32)]
        + list(chain_shape)
    )
    return pl.pallas_call(
        functools.partial(_raw_kernel, ns=ns, threshold=threshold,
                          search=search, advance=advance, sync=sync,
                          stream_sums=stream_sums,
                          equalize_with=equalize_with, decimate=decimate),
        grid=(ntile,),
        in_specs=[vspec(ns), vspec(ns), wspec, wspec,
                  tspec, tspec, pspec, pspec] + cspecs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(xr, xi, wrr, wri, txs_r, txs_i, tpc_r, tpc_i, *consts,
      jnp.reshape(jnp.asarray(eps, jnp.float32), (1, 1)),
      jnp.reshape(jnp.asarray(lsb, jnp.float32), (1, 1)))


def raw_rx_txconst_fused(
    x: Cplx, lts_ref: Cplx, txs: Cplx, tpre: Cplx,
    threshold: float = None, search: int = 192, advance: int = 4,
    eps=0.0, sync: bool = False, serve: bool = False,
    wiener_model: str | None = None, wiener_snr_db: float | None = None,
    lsb=1.0, stream_sums: bool = False, equalize_with: str = "h_linear",
    decimate=True,
) -> dict:
    """One-kernel raw receiver: lane-major (NS, B) streams →
    fused_rx_chain_txconst's output dict + detected/start/metric rows.
    ``x`` may carry int8 ADC words with ``lsb`` their scale (detection
    is scale-free; the LSB applies inside the chain) — the raw stream's
    dominant HBM read halves vs bf16.  ``stream_sums=True`` is the
    streaming configuration: per-stream Σ|eq − tx|² accumulates IN the
    kernel (``evm_sums`` key, (B,)) and the (15, 53, B) eq tensor never
    leaves the chip (``eq`` is None).  ``decimate`` sets the coarse
    Schmidl&Cox stride (True → 16, the sensitivity-record default; 32
    is the high-SNR serving knob at +12% throughput for −0.09%
    detection at −5 dB; 64 trades 1.9% of −5 dB detection for +19% —
    measured, artifacts/raw_kernel_anatomy.json).  Falls back to the
    staged pipeline off-TPU (eq-based EVM computed there by the
    caller; the fallback ignores ``decimate``)."""
    from tpu80211.ops.detect import DEFAULT_THRESHOLD

    thr = DEFAULT_THRESHOLD if threshold is None else threshold
    if not on_tpu():
        from tpu80211.pipeline.raw import raw_rx_txconst

        if x.re.dtype == jnp.int8:
            x = Cplx(x.re.astype(jnp.float32) * lsb,
                     x.im.astype(jnp.float32) * lsb)
        res = raw_rx_txconst(x, lts_ref, txs, tpre, threshold=thr,
                             eps=eps, serve=serve, sync=sync,
                             search=search, advance=advance,
                             wiener_model=wiener_model,
                             wiener_snr_db=wiener_snr_db,
                             equalize_with=equalize_with)
        if stream_sums:
            # same contract as the kernel: per-stream Σ|eq − tx|²
            eqs = res["eq"]
            nb = C.N_BLOCKS
            txb_r = jnp.broadcast_to(
                txs.re[:, :nb].T[:, :, None], eqs.re.shape)
            txb_i = jnp.broadcast_to(
                txs.im[:, :nb].T[:, :, None], eqs.im.shape)
            d_re = eqs.re.astype(jnp.float32) - txb_r
            d_im = eqs.im.astype(jnp.float32) - txb_i
            res["evm_sums"] = jnp.sum(d_re * d_re + d_im * d_im,
                                      axis=(0, 1))
            res["eq"] = None
        return res
    ns, b = x.shape
    assert b % LANES == 0, (b, LANES)
    assert ns % dk.LAG == 0, ns
    h_re = tuple(float(v) for v in np.asarray(lts_ref.re))
    h_im = tuple(float(v) for v in np.asarray(lts_ref.im))
    wrr, wri = dk._mf_bands((h_re, h_im))
    outs = _raw_call(
        x.re, x.im, jnp.asarray(wrr), jnp.asarray(wri),
        txs.re, txs.im, tpre.re, tpre.im, eps,
        threshold=float(thr), search=int(search), advance=int(advance),
        sync=sync, serve=serve, wiener_model=wiener_model,
        wiener_snr_db=wiener_snr_db, lsb=lsb, stream_sums=stream_sums,
        equalize_with=equalize_with, decimate=decimate)
    det, coarse, start, metric = outs[:4]
    res = fc._pack_outputs(outs[4:], serve=serve, eq_stub=stream_sums,
                           evm_sums=stream_sums)
    res["detected"] = det[0] > 0
    res["start"] = start[0]
    res["metric"] = metric[0]
    return res
