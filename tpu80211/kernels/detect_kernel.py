"""Fused Pallas packet-detection kernel: raw streams → timing, one pass.

The XLA detection pipeline (ops/detect.py) runs at 524k streams/s —
88× below the fused chain's frame rate (PERF.md round 3), making
detection the system bottleneck the moment the input is a raw sample
stream.  The pipeline is ~10 separate HLOs (cumsums, convs, argmaxes)
with (B, 2048)-sized intermediates round-tripping HBM between them.

This kernel runs the ENTIRE detection stage for a tile of ``LANES``
streams inside VMEM — one read of the raw samples, a few dozen bytes of
output per stream:

  * **Schmidl&Cox lag-64 metric** — the length-64 sliding-window sums
    (numerator product + both window energies) are computed by dyadic
    doubling (w_{2k}[d] = w_k[d] + w_k[d+k]): 6 shifted adds per plane
    instead of a 2048-long sequential cumsum (TPU has no cheap scan;
    shifted adds are single VPU ops);
  * **LTS matched filter** — cross-correlation with the known 64-sample
    LTS at every offset, as chunked (64, 128) @ (128, LANES) `jnp.dot`s:
    the banded shift matrix W[d, j] = h[j−d] turns 64 offsets × 64 taps
    into one MXU contraction of full 128 depth (the same P4-style
    "reduction tree → matmul inner dim" move as ops/interp.py);
  * **pair disambiguation + 5-sample smoothing + masked argmax + timing
    advance** — exactly ops/detect.py::detect_packet semantics (same
    thresholds, same [-4,-2] timing-band behavior), computed with
    sublane-shift adds and two-pass (max, first-index) reductions.

Layout is lane-major (NS, LANES) like every production kernel; outputs
are (1, L) rows: detected, coarse, start (−1 sentinels when undetected),
peak metric.  On non-TPU backends `detect_streams` falls back to
ops/detect.py (identical math, XLA ops), so the CPU suite exercises the
full contract; the kernel itself is cross-checked against that fallback
on-chip (tests/test_detect.py::test_detect_kernel_matches_xla_on_tpu).

Reference: the stage WiFi_RX.m:7's `threshold` parameter promises but
the reference never implements (PARITY_MAP.md "Detection threshold
mapping").
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
from tpu80211.ops import detect as xla_detect

LANES = 128
LAG = C.N_FFT     # 64
WIN = C.N_FFT     # 64
MF_CHUNK = 2 * LAG  # 128 — matched-filter input chunk (full MXU depth)


@functools.lru_cache(maxsize=None)
def _mf_bands(lts_key):
    """(64, 128) banded shift matrices W[d, j] = h[j − d] for the real
    and imaginary LTS taps (numpy, cached per LTS)."""
    h_re, h_im = lts_key
    wrr = np.zeros((LAG, MF_CHUNK), np.float32)
    wri = np.zeros((LAG, MF_CHUNK), np.float32)
    for d in range(LAG):
        wrr[d, d:d + LAG] = h_re
        wri[d, d:d + LAG] = h_im
    return wrr, wri


def _wsum(x, w):
    """Length-``w`` sliding sums along axis 0 by dyadic doubling:
    out[d] = Σ_{k<w} x[d+k], shape (n−w+1, L).  w must be a power of 2."""
    step = 1
    while step < w:
        x = x[:-step] + x[step:]
        step *= 2
    return x


def _first_true(mask, big):
    """(values first-True-index) over axis 0 of a boolean (n, L) mask:
    argmax-with-ties→first via two reductions (portable to Mosaic)."""
    n = mask.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    return jnp.min(jnp.where(mask, idx, big), axis=0, keepdims=True)


def _argmax_first(vals):
    """First index of the maximum over axis 0, (1, L) int32."""
    m = jnp.max(vals, axis=0, keepdims=True)
    return _first_true(vals >= m, vals.shape[0])


def _detect_core(xr, xi, wrr, wri, *, ns, threshold, search, advance,
                 decimate=False):
    """The detection math on f32 (ns, L) value tensors; returns
    (det (1,L) int32, coarse, start, peak_m) — shared by the standalone
    kernel below and the fully-fused raw-chain kernel
    (kernels/raw_chain.py).

    ``decimate`` evaluates the Schmidl&Cox metric only every ``stride``
    offsets (True → 16; any power-of-2 divisor of 64 accepted, via
    stride-sample block sums — M(stride·i) EXACTLY, not an
    approximation): the LTS plateau spans CP+128 ≈ 160 samples, so any
    stride ≤ 64 grid can never miss it, and the fine timing still comes
    from the full-resolution matched filter (its search window is
    anchored one stride before the decimated hit to cover the
    granularity).  Saves the ~24 dyadic window-sum passes; ``coarse``
    is then stride-granular."""
    f32 = jnp.float32

    # ---- Schmidl&Cox lag-64 normalized autocorrelation ----------------
    ar, ai = xr[:-LAG], xi[:-LAG]                   # (ns-64, L)
    br, bi = xr[LAG:], xi[LAG:]
    stride = (16 if decimate is True else int(decimate)) if decimate else 0
    if decimate:
        assert WIN % stride == 0 and stride <= WIN, stride
        nblk = (ns - LAG) // stride                 # stride-sample blocks
        lanes = ar.shape[-1]

        def bsum(v):                                # (ns-64, L) → (nblk, L)
            return jnp.sum(v.reshape(nblk, stride, lanes), axis=1)

        bp_re = bsum(ar * br + ai * bi)
        bp_im = bsum(ai * br - ar * bi)
        be1 = bsum(ar * ar + ai * ai)
        be2 = bsum(br * br + bi * bi)

        nwin = WIN // stride                        # blocks per 64-window
        # sliding nwin-block sums, (nblk, L) → (nblk-nwin+1, L)
        p_re, p_im, e1, e2 = (_wsum(bp_re, nwin), _wsum(bp_im, nwin),
                              _wsum(be1, nwin), _wsum(be2, nwin))
        m = (p_re * p_re + p_im * p_im) / jnp.maximum(e1 * e2, 1e-30)
        nm = m.shape[0]
        above = m > threshold
        det = jnp.max(above.astype(jnp.int32), axis=0, keepdims=True)
        c16 = _first_true(above, nm)
        # anchor the fine search one stride early: the true first
        # crossing can precede the decimated hit by up to stride-1
        coarse = jnp.maximum(c16 * stride - stride, 0)
        search0 = search                            # caller's window
        search = search + stride                    # widened fine window
    else:
        p_re = _wsum(ar * br + ai * bi, WIN)        # Σ a·conj(b), re
        p_im = _wsum(ai * br - ar * bi, WIN)        # (ns-128+1, L)
        e1 = _wsum(ar * ar + ai * ai, WIN)
        e2 = _wsum(br * br + bi * bi, WIN)
        m = (p_re * p_re + p_im * p_im) / jnp.maximum(e1 * e2, 1e-30)
        nm = m.shape[0]
        above = m > threshold
        det = jnp.max(above.astype(jnp.int32), axis=0, keepdims=True)
        coarse = _first_true(above, nm)             # nm when none (gated)
        search0 = search

    # ---- LTS matched filter as chunked full-depth MXU dots ------------
    n_mf = ns - LAG + 1
    n_chunks = (ns - MF_CHUNK) // LAG + 1           # offsets 0..64·n-1
    mf_rows = []
    for c in range(n_chunks):
        lo = c * LAG
        cr_ = xr[lo:lo + MF_CHUNK, :].astype(wrr.dtype)
        ci_ = xi[lo:lo + MF_CHUNK, :].astype(wrr.dtype)
        # corr[d] = Σ_t x[d+t]·conj(ref[t])
        yr = jnp.dot(wrr, cr_, preferred_element_type=f32) + jnp.dot(
            wri, ci_, preferred_element_type=f32)
        yi = jnp.dot(wrr, ci_, preferred_element_type=f32) - jnp.dot(
            wri, cr_, preferred_element_type=f32)
        mf_rows.append(jnp.sqrt(yr * yr + yi * yi))
    mf = jnp.concatenate(mf_rows, axis=0)[:n_mf - 1]  # (64·n_chunks, L)

    # 5-sample smoothing (dyadic 4 + tail 1), then the 64-apart pair sum
    mf4 = _wsum(mf, 4)
    mf_s = mf4[:-1] + mf[4:]                        # length-5 sums
    pair = mf_s[:-LAG] + mf_s[LAG:]                 # (np, L)
    np_ = pair.shape[0]

    idx_p = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    lo = coarse                                     # (1, L)
    mask = jnp.logical_and(idx_p >= lo, idx_p < lo + 2 * search)
    rep1 = _argmax_first(jnp.where(mask, pair, 0.0)) + 2
    start = rep1 - 32 - advance

    idx_m = jax.lax.broadcasted_iota(jnp.int32, (nm, 1), 0)
    if decimate:
        idx_m = idx_m * stride                      # block → sample units
    # undetected lanes: _first_true returns nm so [lo, lo+2·search) is
    # empty and the metric would read 0.0, while the XLA path's argmax
    # of an all-False mask lands at lo=0 and reports the window peak —
    # match that window anchor ([0, 2·search0), the CALLER'S window, not
    # the stride-widened fine window the detected lanes use).  Under
    # decimation the peak is still evaluated on the stride grid, so the
    # undetected metric equals the XLA value only at full resolution
    # (same stride caveat as `coarse`, docstring above)
    win_m = jnp.where(det > 0, 2 * search, 2 * search0)
    lo_m = jnp.where(det > 0, lo, 0)
    mask_m = jnp.logical_and(idx_m >= lo_m, idx_m < lo_m + win_m)
    peak_m = jnp.max(jnp.where(mask_m, m, 0.0), axis=0, keepdims=True)
    return det, coarse, start, peak_m


def _barrel_align(xr, xi, s, ns):
    """Per-lane extraction by barrel shift, entirely in VMEM.

    A per-lane dynamic sublane slice does not exist on TPU (and XLA's
    gather for it costs 200+ ms per batch — measured).  But
    shift-by-start decomposes into its binary digits: for each bit b,
    roll the WHOLE block up by 2^b and keep the rolled copy only in
    lanes whose start has that bit — log2(range) select+roll passes
    (~20 ops), no gather anywhere.  Rolled wrap-around garbage only
    ever reaches rows ≥ ns − start, which is ≥ the 1360 rows read
    (start ≤ ns − 1360 by the caller's clamp).  ``xr``/``xi`` must be
    f32/int32-width (Mosaic's rotate is 32-bit-only).  Returns the
    aligned (ns, L) planes; rows ≥ 1360 are garbage."""
    total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES
    cur_r, cur_i = xr, xi
    nbits = max(1, int(np.ceil(np.log2(ns - total + 1))))
    for b in range(nbits):
        sh = 1 << b
        # roll-up by sh ≡ roll-down by ns − sh (pltpu.roll requires a
        # non-negative shift)
        roll_r = pltpu.roll(cur_r, ns - sh, 0)
        roll_i = pltpu.roll(cur_i, ns - sh, 0)
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(s, b), 1) > 0   # (1, L)
        cur_r = jnp.where(bit, roll_r, cur_r)
        cur_i = jnp.where(bit, roll_i, cur_i)
    return cur_r, cur_i


def _barrel_align_packed(raw_r, raw_i, s, ns):
    """bf16 variant of `_barrel_align` at ~half the VPU passes: the two
    bf16 planes are bitcast to int32 (Mosaic packs adjacent sublane
    pairs: row 2k → low 16 bits, row 2k+1 → high), so every even shift
    is a half-height int32 roll, and the odd-shift bit is a half-word
    recombination ((p >> 16) | (next_p << 16)).  Returns aligned bf16
    planes — bit-identical to the f32 path for bf16 inputs."""
    half = ns // 2
    pr = pltpu.bitcast(raw_r, jnp.int32)            # (ns/2, L)
    pi = pltpu.bitcast(raw_i, jnp.int32)
    total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES
    nbits = max(1, int(np.ceil(np.log2(ns - total + 1))))
    for b in range(1, nbits):
        sh32 = (1 << b) // 2
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(s, b), 1) > 0   # (1, L)
        pr = jnp.where(bit, pltpu.roll(pr, half - sh32, 0), pr)
        pi = jnp.where(bit, pltpu.roll(pi, half - sh32, 0), pi)

    def shift1(p):
        nxt = pltpu.roll(p, half - 1, 0)
        return jnp.bitwise_or(
            jax.lax.shift_right_logical(p, 16),
            jax.lax.shift_left(jnp.bitwise_and(nxt, 0xFFFF), 16),
        )

    bit0 = jnp.bitwise_and(s, 1) > 0
    pr = jnp.where(bit0, shift1(pr), pr)
    pi = jnp.where(bit0, shift1(pi), pi)
    return (pltpu.bitcast(pr, jnp.bfloat16),
            pltpu.bitcast(pi, jnp.bfloat16))


def _kernel(xr_ref, xi_ref, wrr_ref, wri_ref,
            det_out, coarse_out, start_out, metric_out, *rest,
            ns, threshold, search, advance, align=False, decimate=False):
    f32 = jnp.float32
    xr = xr_ref[:].astype(f32)                      # (ns, L)
    xi = xi_ref[:].astype(f32)
    det, coarse, start, peak_m = _detect_core(
        xr, xi, wrr_ref[:], wri_ref[:], ns=ns, threshold=threshold,
        search=search, advance=advance, decimate=decimate)

    detected = det > 0
    det_out[:] = det
    coarse_out[:] = jnp.where(detected, coarse, -1)
    start_out[:] = jnp.where(detected, start, -1)
    metric_out[:] = peak_m

    if align:
        lp_r, lp_i, pkt_r, pkt_i = rest
        total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES
        s = jnp.clip(jnp.where(detected, start, 0), 0, ns - total)
        if xr_ref.dtype == jnp.bfloat16:
            cur_r, cur_i = _barrel_align_packed(
                xr_ref[:], xi_ref[:], s, ns)
        else:
            cur_r, cur_i = _barrel_align(xr, xi, s, ns)
        lp_r[:] = cur_r[: C.PREAMBLE_SAMPLES].astype(lp_r.dtype)
        lp_i[:] = cur_i[: C.PREAMBLE_SAMPLES].astype(lp_i.dtype)
        pkt_r[:] = cur_r[C.PREAMBLE_SAMPLES : total].astype(pkt_r.dtype)
        pkt_i[:] = cur_i[C.PREAMBLE_SAMPLES : total].astype(pkt_i.dtype)


@functools.partial(jax.jit, static_argnames=("threshold", "search",
                                             "advance", "align",
                                             "decimate"))
def _detect_call(xr, xi, wrr, wri, threshold, search, advance,
                 align=False, decimate=False):
    ns, b = xr.shape
    ntile = b // LANES

    def vspec(dim):
        return pl.BlockSpec((dim, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((LAG, MF_CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [vspec(1)] * 4
    out_shape = [jax.ShapeDtypeStruct((1, b), jnp.int32)] * 3 + [
        jax.ShapeDtypeStruct((1, b), jnp.float32)
    ]
    if align:
        out_specs += [vspec(C.PREAMBLE_SAMPLES)] * 2 + [
            vspec(C.PACKET_SAMPLES)
        ] * 2
        out_shape += [
            jax.ShapeDtypeStruct((C.PREAMBLE_SAMPLES, b), xr.dtype)
        ] * 2 + [jax.ShapeDtypeStruct((C.PACKET_SAMPLES, b), xr.dtype)] * 2
    return pl.pallas_call(
        functools.partial(_kernel, ns=ns, threshold=threshold,
                          search=search, advance=advance, align=align,
                          decimate=decimate),
        grid=(ntile,),
        in_specs=[vspec(ns), vspec(ns), wspec, wspec],
        out_specs=out_specs,
        out_shape=out_shape,
    )(xr, xi, wrr, wri)


def detect_streams(
    x: Cplx,                      # (NS, B) lane-major raw streams
    lts_ref: Cplx,                # (64,) known time-domain LTS
    threshold: float = xla_detect.DEFAULT_THRESHOLD,
    search: int = 192,
    advance: int = 4,
    decimate: bool = False,
) -> dict:
    """Lane-major fused detection: dict of (B,) arrays ``detected``
    (bool), ``coarse``/``start`` (int32, −1 when undetected),
    ``metric`` (f32) — ops/detect.py::detect_packet semantics at
    kernel speed.  B must be a multiple of LANES; NS a multiple of 64.
    ``decimate=True`` samples the coarse metric every 16 offsets (see
    _detect_core) — ~40% faster, identical fine timing, 16-granular
    ``coarse``.  Off-TPU the XLA fallback ignores ``decimate`` (always
    full-resolution), so ``coarse`` granularity differs between
    backends when decimating; ``detected``/``start`` do not."""
    ns, b = x.shape
    assert b % LANES == 0, (b, LANES)
    assert ns % LAG == 0, ns
    if not on_tpu():
        res = xla_detect.detect_packet(
            Cplx(x.re.T, x.im.T), lts_ref, threshold=threshold,
            search=search, advance=advance)
        return res
    h_re = tuple(float(v) for v in np.asarray(lts_ref.re))
    h_im = tuple(float(v) for v in np.asarray(lts_ref.im))
    wrr, wri = _mf_bands((h_re, h_im))
    det, coarse, start, metric = _detect_call(
        x.re, x.im, jnp.asarray(wrr), jnp.asarray(wri),
        threshold=float(threshold), search=int(search),
        advance=int(advance), decimate=decimate)
    return {
        "detected": det[0] > 0,
        "coarse": coarse[0],
        "start": start[0],
        "metric": metric[0],
    }


def detect_and_align(
    x: Cplx,                      # (NS, B) lane-major raw streams
    lts_ref: Cplx,
    threshold: float = xla_detect.DEFAULT_THRESHOLD,
    search: int = 192,
    advance: int = 4,
) -> tuple[dict, Cplx, Cplx]:
    """Detection + per-stream extraction in ONE kernel pass: the raw
    stream is read from HBM once; the per-lane barrel shifter aligns
    each stream's packet in VMEM (see _kernel) and only the
    (160, B) + (1200, B) aligned views leave.  Returns
    (detection dict, lptot, packet) — undetected lanes are aligned at
    offset 0 and flagged; gate on ``detected``."""
    ns, b = x.shape
    assert b % LANES == 0, (b, LANES)
    assert ns % LAG == 0, ns
    if not on_tpu():
        res = xla_detect.detect_packet(
            Cplx(x.re.T, x.im.T), lts_ref, threshold=threshold,
            search=search, advance=advance)
        start = jnp.maximum(jnp.asarray(res["start"], jnp.int32), 0)
        lp, pkt = extract_lane_major(x, start)
        return res, lp, pkt
    h_re = tuple(float(v) for v in np.asarray(lts_ref.re))
    h_im = tuple(float(v) for v in np.asarray(lts_ref.im))
    wrr, wri = _mf_bands((h_re, h_im))
    (det, coarse, start, metric, lp_r, lp_i, pkt_r, pkt_i) = _detect_call(
        x.re, x.im, jnp.asarray(wrr), jnp.asarray(wri),
        threshold=float(threshold), search=int(search),
        advance=int(advance), align=True)
    res = {
        "detected": det[0] > 0,
        "coarse": coarse[0],
        "start": start[0],
        "metric": metric[0],
    }
    return res, Cplx(lp_r, lp_i), Cplx(pkt_r, pkt_i)


def _barrel_place_packed(sr, si, offs, ns, nbits=None):
    """Packed-int32 INVERSE barrel: roll each lane's bf16 planes DOWN by
    ``offs`` at ~half the f32 passes (the placement-direction twin of
    `_barrel_align_packed`): even offset bits are half-height int32
    rolls, the odd bit a half-word recombination pulling the previous
    word's high half.  ``nbits`` bounds the offset width (default
    ceil(log2 ns)); callers whose offsets are provably narrower pass a
    tighter bound and skip the dead passes.  Returns bf16 planes."""
    pr = pltpu.bitcast(sr, jnp.int32)               # (ns/2, L)
    pi = pltpu.bitcast(si, jnp.int32)
    if nbits is None:
        nbits = max(1, int(np.ceil(np.log2(ns))))
    for b in range(1, nbits):
        sh32 = (1 << b) // 2
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(offs, b), 1) > 0
        pr = jnp.where(bit, pltpu.roll(pr, sh32, 0), pr)
        pi = jnp.where(bit, pltpu.roll(pi, sh32, 0), pi)

    def shift1_down(p):
        prv = pltpu.roll(p, 1, 0)
        return jnp.bitwise_or(
            jax.lax.shift_right_logical(prv, 16),
            jax.lax.shift_left(jnp.bitwise_and(p, 0xFFFF), 16),
        )

    bit0 = jnp.bitwise_and(offs, 1) > 0
    pr = jnp.where(bit0, shift1_down(pr), pr)
    pi = jnp.where(bit0, shift1_down(pi), pi)
    return (pltpu.bitcast(pr, jnp.bfloat16),
            pltpu.bitcast(pi, jnp.bfloat16))


def _place_kernel(sr_ref, si_ref, nr_ref, ni_ref, off_ref, xr_ref, xi_ref,
                  *, ns):
    """Inverse barrel shifter: roll each lane's frame DOWN by its offset
    (VMEM rolls — the XLA jnp.roll chain costs ~14 ms/batch of HBM
    passes at B=32768) and add the noise field.  bf16 planes take the
    packed-int32 path (half the passes, cf. _barrel_align_packed)."""
    f32 = jnp.float32
    offs = off_ref[:]                               # (1, L) int32
    nbits = max(1, int(np.ceil(np.log2(ns))))
    if sr_ref.dtype == jnp.bfloat16:
        br_, bi_ = _barrel_place_packed(sr_ref[:], si_ref[:], offs, ns,
                                        nbits=nbits)
        cur_r = br_.astype(f32)
        cur_i = bi_.astype(f32)
    else:
        cur_r = sr_ref[:].astype(f32)
        cur_i = si_ref[:].astype(f32)
        for b in range(nbits):
            sh = (1 << b) % ns
            roll_r = pltpu.roll(cur_r, sh, 0)
            roll_i = pltpu.roll(cur_i, sh, 0)
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(offs, b), 1) > 0
            cur_r = jnp.where(bit, roll_r, cur_r)
            cur_i = jnp.where(bit, roll_i, cur_i)
    xr_ref[:] = (cur_r + nr_ref[:].astype(f32)).astype(xr_ref.dtype)
    xi_ref[:] = (cur_i + ni_ref[:].astype(f32)).astype(xi_ref.dtype)


@jax.jit
def _place_call(sr, si, nr, ni, offs):
    ns, b = sr.shape
    ntile = b // LANES

    def vspec(dim):
        return pl.BlockSpec((dim, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_place_kernel, ns=ns),
        grid=(ntile,),
        in_specs=[vspec(ns)] * 4 + [vspec(1)],
        out_specs=[vspec(ns)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ns, b), sr.dtype)] * 2,
    )(sr, si, nr, ni, offs)


def place_streams(sig: Cplx, noise: Cplx, offs: jnp.ndarray) -> Cplx:
    """x[r, l] = sig[(r − offs[l]) mod ns, l] + noise[r, l] — per-lane
    frame placement for the raw-stream generator, lane-major (ns, B).
    Falls back to the XLA roll chain off-TPU."""
    ns, b = sig.shape
    if not on_tpu() or b % LANES != 0:
        cur_r, cur_i = sig.re, sig.im
        nbits = max(1, int(np.ceil(np.log2(ns))))
        for bit_i in range(nbits):
            sh = (1 << bit_i) % ns
            bit = (jnp.bitwise_and(
                jnp.right_shift(offs, np.int32(bit_i)), np.int32(1))
                > 0)[None, :]
            cur_r = jnp.where(bit, jnp.roll(cur_r, sh, axis=0), cur_r)
            cur_i = jnp.where(bit, jnp.roll(cur_i, sh, axis=0), cur_i)
        return Cplx(cur_r + noise.re, cur_i + noise.im)
    xr, xi = _place_call(sig.re, sig.im, noise.re, noise.im,
                         jnp.asarray(offs, jnp.int32)[None, :])
    return Cplx(xr, xi)


def extract_lane_major(x: Cplx, start: jnp.ndarray) -> tuple[Cplx, Cplx]:
    """Slice (lptot (160, B), packet (1200, B)) at per-stream ``start``
    from lane-major (NS, B) streams — one gather along the sample axis
    (`take_along_axis`), feeding kernels/fused_chain.py directly."""
    total = C.PREAMBLE_SAMPLES + C.PACKET_SAMPLES
    ns = x.shape[0]
    s = jnp.clip(start, 0, ns - total)
    rows = s[None, :] + jnp.arange(total, dtype=start.dtype)[:, None]
    fr = jnp.take_along_axis(x.re, rows, axis=0)
    fi = jnp.take_along_axis(x.im, rows, axis=0)
    lp = Cplx(fr[: C.PREAMBLE_SAMPLES], fi[: C.PREAMBLE_SAMPLES])
    pkt = Cplx(fr[C.PREAMBLE_SAMPLES :], fi[C.PREAMBLE_SAMPLES :])
    return lp, pkt
