"""Generative fused kernel: frames synthesized INSIDE the chain kernel.

The device-resident stream (pipeline/stream.py + datasets/synthetic_sc.py)
removed the host from the loop but still pays full HBM round-trips for the
generated packets — at stream rate the generator (XLA threefry/rbg
normals + (1200, B) assembly) costs ~2.3 ms of a 3.1 ms batch.  This
kernel is the speed-of-light version: the per-frame channel and noise are
drawn with the Pallas TPU PRNG (`pltpu.prng_random_bits`) directly in
VMEM, the chain runs in the frequency domain (generation produces block
spectra, so the DFT stage of kernels/fused_chain.py disappears), and the
only HBM traffic is the *outputs* (~6 kB/frame) — there are no inputs at
all beyond a seed scalar and ~7 kB of replicated constants.

Stream semantics (tx-constant, matching the device stream):

  * channel: exponential-PDP taps (8 per frame, channel-model-'A'-like)
    drawn CN(0, p_l); CFR = W @ taps on the MXU (same PDP as
    datasets/synthetic.py and synthetic_sc.py);
  * rx block spectra: txs[:, b]·H + N_b with per-bin noise variance
    s = 64·σ_t² (the DFT of white per-sample σ_t² time noise);
  * preamble: two repeats tpre·H + N₁, tpre·H + N₂ averaged like
    WiFi_RX.m:19-29; σ̂² from the repeat difference with the 64/53
    band-limitation unbiasing factor (noise exists only on the 53 used
    bins here, unlike the time-domain generator) — E[σ̂²] = σ_t²;
  * estimators + PS-Linear-blend equalization exactly as
    kernels/fused_chain.py (same math, frequency-native).

Outputs add the true CFR (``h_true``) so stream summaries can compute
CFR NMSE without any side-channel.  Normals are Box-Muller over 24-bit
uniforms from the hardware PRNG, seeded per (seed, grid tile) —
deterministic for a given seed.

On non-TPU backends `fused_gen_chain` falls back to a statistically
identical plain-JAX implementation (jax.random normals; different bit
streams, same distributions and identical chain math) so the CPU test
suite exercises the full output contract.
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
from tpu80211.kernels.fused_chain import NB_PAD
from tpu80211.ops.interp import interp_matrix

LANES = 128
_P0, _P1, _P2, _P3 = C.PILOT_IDX
INTERP_KINDS = ("linear", "cubic", "sinc", "spline", "wiener")
N_TAPS = 8
RMS_SPREAD = 2.0
_TWO_PI = 2.0 * np.pi


@functools.lru_cache(maxsize=None)
def _pdp_scale(model: str | None = None) -> np.ndarray:
    """(n_taps, 1) per-tap normal scale sqrt(p_l / 2), exponential PDP."""
    from tpu80211.ops import channel

    p = channel.pdp(model)
    return np.sqrt(p / 2.0).astype(np.float32)[:, None]


@functools.lru_cache(maxsize=None)
def _cfr_mats(n_taps: int = N_TAPS) -> tuple[np.ndarray, np.ndarray]:
    """(53, n_taps) taps→CFR evaluation matrix, split planes (numpy)."""
    k = (np.arange(C.N_SC) - C.FFT_SHIFT) % C.N_FFT
    n = np.arange(n_taps)
    w = np.exp(-2j * np.pi * np.outer(k, n) / C.N_FFT)  # (53, taps)
    return (np.ascontiguousarray(w.real, np.float32),
            np.ascontiguousarray(w.imag, np.float32))


def _row_mask(n, row):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == row


@functools.lru_cache(maxsize=None)
def _ln_poly() -> tuple[float, ...]:
    """Degree-5 polynomial coefficients (highest first) fitting ln on
    [1, 2]; max abs error ~3e-7 — far below what noise synthesis needs."""
    x = np.linspace(1.0, 2.0, 4097)
    return tuple(float(c) for c in np.polyfit(x, np.log(x), 5))


def _fast_log(u):
    """ln(u) for f32 u > 0 via exponent extraction + mantissa polynomial.

    Mosaic's jnp.log lowering costs ~0.6 µs/element on this chip
    (measured: it alone made the generative kernel 25× slower than the
    whole chain).  ln(u) = (E−127)·ln2 + ln(1.m) with ln on [1,2) as a
    5th-degree polynomial is ~10 cheap VPU ops."""
    f32 = jnp.float32
    bi = pltpu.bitcast(u, jnp.int32)
    e = jnp.bitwise_and(jax.lax.shift_right_logical(bi, 23), 0xFF)
    ef = e.astype(f32) - 127.0
    m = pltpu.bitcast(
        jnp.bitwise_or(jnp.bitwise_and(bi, 0x7FFFFF), 0x3F800000), f32
    )
    cs = _ln_poly()
    p = jnp.full(m.shape, np.float32(cs[0]))
    for c in cs[1:]:
        p = p * m + np.float32(c)
    return p + ef * np.float32(np.log(2.0))


def _gen_kernel(txs_r, txs_i, tpc_r, tpc_i, wcr_ref, wci_ref,
                winre_ref, winim_ref, seed_ref,
                hlt_r, hlt_i, hlin_r, hlin_i, hcub_r, hcub_i,
                hsin_r, hsin_i, hspl_r, hspl_i, hwie_r, hwie_i,
                hmmse_r, hmmse_i, eq_r, eq_i, ow2_out,
                htr_out, hti_out, chk_out, *rest, snr_db: float,
                rms: float = RMS_SPREAD, n_taps: int = N_TAPS,
                stream_sums: bool = False, probe: str = "full"):
    f32 = jnp.float32
    pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))

    # ``probe`` selects deterministic stand-ins for pieces of the frame
    # synthesis (perf anatomy, scripts/bench_stream.py --probe) — an
    # explicit static argument, NOT an env var: a probe accidentally left
    # enabled in the environment would silently corrupt stream results
    # through the jit cache (ADVICE round-3).  Production entry points
    # always trace with probe="full".
    _probe = probe

    def normals(n):
        """Two independent (n, LANES) standard-normal tensors
        (Box-Muller over 24-bit hardware uniforms)."""
        if _probe == "const":          # perf probe: no PRNG, no transforms
            z = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 1).astype(f32)
            z = z * (1.0 / LANES) - 0.5
            return z, -z
        b1 = pltpu.prng_random_bits((n, LANES))
        b2 = pltpu.prng_random_bits((n, LANES))
        # 24-bit mantissa-exact uniforms in (0, 1): int32 >> 8 then scale
        u1 = (jax.lax.shift_right_logical(b1, 8).astype(jnp.int32)
              .astype(f32)) * (2.0 ** -24) + (2.0 ** -25)
        u2 = (jax.lax.shift_right_logical(b2, 8).astype(jnp.int32)
              .astype(f32)) * (2.0 ** -24)
        if _probe == "uniform":        # perf probe: PRNG, no Box-Muller
            s = np.float32(np.sqrt(12.0))
            return (u1 - 0.5) * s, (u2 - 0.5) * s
        if _probe == "nolog":          # perf probe: trig only
            th = _TWO_PI * u2
            return jnp.cos(th), jnp.sin(th)
        if _probe == "nocos":          # perf probe: log/sqrt only
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            s = np.float32(np.sqrt(12.0))
            return r * (u2 - 0.5) * s, r * (u1 - 0.5) * s
        if _probe == "jnplog":         # perf probe: Mosaic's native log
            r = jnp.sqrt(-2.0 * jnp.log(u1))
        else:
            # clamp: the polynomial's ~2e-5 error can push ln(u) just
            # above 0 for u ≈ 1, and sqrt of that tiny negative is a NaN
            # that a later global reduction would propagate everywhere
            r = jnp.sqrt(jnp.maximum(-2.0 * _fast_log(u1), 0.0))
        th = _TWO_PI * u2
        return r * jnp.cos(th), r * jnp.sin(th)

    # -- channel: taps → CFR on the MXU --------------------------------------
    # per-tap scale sqrt(p_l/2) built from an iota (kernels cannot capture
    # array constants); the PDP normalizer is a Python float
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (n_taps, 1), 0).astype(f32)
    psum = float(np.exp(-np.arange(n_taps) / rms).sum())
    tscale = jnp.sqrt(jnp.exp(-l_idx / rms) / (2.0 * psum))
    t_re, t_im = normals(n_taps)
    t_re = t_re * tscale
    t_im = t_im * tscale
    wcr = wcr_ref[:]                                   # (53, N_TAPS)
    wci = wci_ref[:]
    h_re = jnp.dot(wcr, t_re, preferred_element_type=f32) - jnp.dot(
        wci, t_im, preferred_element_type=f32)
    h_im = jnp.dot(wcr, t_im, preferred_element_type=f32) + jnp.dot(
        wci, t_re, preferred_element_type=f32)
    htr_out[:] = h_re
    hti_out[:] = h_im

    # per-bin freq noise scale: var s = 64·σ_t², σ_t² = 10^(-snr/10)/64
    sigma_t2 = (10.0 ** (-snr_db / 10.0)) / C.N_FFT
    nsc = np.float32(np.sqrt(C.N_FFT * sigma_t2 / 2.0))

    # -- preamble: two noisy repeats, averaged; σ̂² from the difference -------
    tpre_r = tpc_r[:]                                  # (53, 1)
    tpre_i = tpc_i[:]
    cl_r = tpre_r * h_re - tpre_i * h_im               # clean tpre·H (53, L)
    cl_i = tpre_r * h_im + tpre_i * h_re
    n1r, n1i = normals(C.N_SC)
    n2r, n2i = normals(C.N_SC)
    rpre_r = cl_r + nsc * 0.5 * (n1r + n2r)
    rpre_i = cl_i + nsc * 0.5 * (n1i + n2i)
    dr = nsc * (n2r - n1r)
    di = nsc * (n2i - n1i)
    # unbiased σ_t² estimate from 53-bin band-limited noise (module doc)
    ow2 = jnp.sum(dr * dr + di * di, axis=0, keepdims=True) / (
        2.0 * C.N_FFT * C.N_SC)
    ow2_out[:] = ow2

    # -- LT-LS ----------------------------------------------------------------
    dc = _row_mask(C.N_SC, C.DC_IDX)
    denom = tpre_r * tpre_r + tpre_i * tpre_i
    denom = jnp.where(dc, 1.0, denom)
    hlt_re = (tpre_r * rpre_r + tpre_i * rpre_i) / denom
    hlt_im = (tpre_r * rpre_i - tpre_i * rpre_r) / denom
    hlt_re = jnp.where(dc, 0.0, hlt_re)
    hlt_im = jnp.where(dc, 0.0, hlt_im)
    hlt_r[:] = hlt_re
    hlt_i[:] = hlt_im
    chk = ow2 + jnp.sum(hlt_re + hlt_im, axis=0, keepdims=True)

    # -- rx block spectra + pilot ratios -------------------------------------
    def cdiv(ar, ai, br, bi):
        d = br * br + bi * bi
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d

    blocks = []
    for b in range(C.N_BLOCKS):
        tbr = txs_r[:, b:b + 1]
        tbi = txs_i[:, b:b + 1]
        nbr, nbi = normals(C.N_SC)
        rbr = (tbr * h_re - tbi * h_im) + nsc * nbr
        rbi = (tbr * h_im + tbi * h_re) + nsc * nbi
        blocks.append((tbr, tbi, rbr, rbi))

    hp = []
    for b in range(C.N_AVG_BLOCKS):
        tbr, tbi, rbr, rbi = blocks[b]
        pr, pi_ = [], []
        for p in (_P0, _P1, _P2, _P3):
            qr, qi = cdiv(rbr[p:p + 1, :], rbi[p:p + 1, :],
                          tbr[p:p + 1, :], tbi[p:p + 1, :])
            pr.append(qr)
            pi_.append(qi)
        hp.append((jnp.concatenate(pr, axis=0), jnp.concatenate(pi_, axis=0)))

    # -- interpolators (same math as fused_chain._kernel) ---------------------
    def interp(idx, out_r, out_i, complex_w=False):
        wr = winre_ref[idx]
        acc_r = jnp.zeros((C.N_SC, LANES), f32)
        acc_i = jnp.zeros((C.N_SC, LANES), f32)
        for b in range(C.N_AVG_BLOCKS):
            acc_r = acc_r + jnp.dot(wr, hp[b][0], preferred_element_type=f32)
            acc_i = acc_i + jnp.dot(wr, hp[b][1], preferred_element_type=f32)
        if complex_w:
            wi = winim_ref[idx]
            for b in range(C.N_AVG_BLOCKS):
                acc_r = acc_r - jnp.dot(wi, hp[b][1], preferred_element_type=f32)
                acc_i = acc_i + jnp.dot(wi, hp[b][0], preferred_element_type=f32)
        out_r[:] = acc_r / C.N_AVG_BLOCKS
        out_i[:] = acc_i / C.N_AVG_BLOCKS
        return acc_r / C.N_AVG_BLOCKS, acc_i / C.N_AVG_BLOCKS

    hlin_re, hlin_im = interp(0, hlin_r, hlin_i)
    hcub = interp(1, hcub_r, hcub_i)
    hsin = interp(2, hsin_r, hsin_i)
    hspl = interp(3, hspl_r, hspl_i)
    hwie = interp(4, hwie_r, hwie_i, complex_w=True)
    for hr, hi in ((hlin_re, hlin_im), hcub, hsin, hspl, hwie):
        chk = chk + jnp.sum(hr + hi, axis=0, keepdims=True)

    # -- MMSE (rank-1 closed form) --------------------------------------------
    acc_r = jnp.zeros((C.N_SC, LANES), f32)
    acc_i = jnp.zeros((C.N_SC, LANES), f32)
    for b in range(C.N_AVG_BLOCKS):
        tbr, tbi, rbr, rbi = blocks[b]
        ur = tbr * hlt_re - tbi * hlt_im
        ui = tbr * hlt_im + tbi * hlt_re
        den = ow2 + jnp.sum(ur * ur + ui * ui, axis=0, keepdims=True)
        sr = jnp.sum(ur * rbr + ui * rbi, axis=0, keepdims=True) / den
        si = jnp.sum(ur * rbi - ui * rbr, axis=0, keepdims=True) / den
        acc_r = acc_r + (hlt_re * sr - hlt_im * si)
        acc_i = acc_i + (hlt_re * si + hlt_im * sr)
    hmmse_r[:] = acc_r / C.N_AVG_BLOCKS
    hmmse_i[:] = acc_i / C.N_AVG_BLOCKS
    chk = chk + jnp.sum(acc_r + acc_i, axis=0, keepdims=True) / C.N_AVG_BLOCKS

    # -- equalize (PS-Linear blend, WiFi_RX.m:60) -----------------------------
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

    if stream_sums:
        # in-kernel stream summaries: per-lane Σ|ĥ − h|² for each of the
        # 7 estimators + Σ|h|², ACCUMULATED across grid steps into one
        # (8, LANES) block (constant index map; grid steps are sequential
        # on TPU).  The stream step never reads the full h planes from
        # HBM — its summaries come from here.
        (sums_out,) = rest
        mm_r = acc_r / C.N_AVG_BLOCKS
        mm_i = acc_i / C.N_AVG_BLOCKS
        pairs = [(hlt_re, hlt_im), (hlin_re, hlin_im), hcub, hsin, hspl,
                 hwie, (mm_r, mm_i)]
        rows = [
            jnp.sum((pr - h_re) ** 2 + (pi - h_im) ** 2, axis=0,
                    keepdims=True)
            for pr, pi in pairs
        ] + [jnp.sum(h_re * h_re + h_im * h_im, axis=0, keepdims=True)]
        tile_sums = jnp.concatenate(rows, axis=0)      # (8, LANES)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            sums_out[:] = jnp.zeros_like(tile_sums)

        sums_out[:] += tile_sums


_OUT_NAMES = ("h_lt", "h_linear", "h_cubic", "h_sinc", "h_spline",
              "h_wiener", "h_mmse")


@functools.partial(jax.jit, static_argnames=("batch", "snr_db", "eq_dtype",
                                             "channel_model", "stream_sums",
                                             "probe"))
def _gen_call(txs_r, txs_i, tpc_r, tpc_i, seed, batch, snr_db, eq_dtype,
              channel_model=None, stream_sums=False, probe="full"):
    from tpu80211.ops import channel

    ntile = batch // LANES
    rms = channel.rms_samples(channel_model)
    n_taps = channel.n_taps_for(channel_model)

    def vspec(dim):
        return pl.BlockSpec((dim, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def stub(dim):
        # constant index map: every grid step targets the same block —
        # HBM footprint one tile (last tile's values; stream mode only)
        return pl.BlockSpec((dim, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    tspec = pl.BlockSpec((C.N_SC, NB_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((C.N_SC, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((C.N_SC, n_taps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    wispec = pl.BlockSpec((len(INTERP_KINDS), C.N_SC, 4), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    wcr, wci = _cfr_mats(n_taps)
    # the Wiener interpolator's prior matches the channel model + SNR the
    # kernel itself synthesizes (VERDICT round-3 weak#5 — a trace-time
    # constant, so conditioning it costs nothing)
    wstack = np.stack([
        interp_matrix(k, channel_model=channel_model, snr_db=snr_db).T
        for k in INTERP_KINDS
    ])
    if stream_sums:
        # stream mode: summaries accumulate in-kernel; the full h planes,
        # eq, ow2 and h_true collapse to single tiles (only the sampled
        # record and the state-carrying checksum leave at width)
        h53 = stub(C.N_SC)
        hdim = LANES
        eq_spec = pl.BlockSpec((C.N_BLOCKS, C.N_SC, LANES),
                               lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        eq_dim = LANES
        o1 = stub(1)
        odim = LANES
    else:
        h53 = vspec(C.N_SC)
        hdim = batch
        eq_spec = pl.BlockSpec((C.N_BLOCKS, C.N_SC, LANES),
                               lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        eq_dim = batch
        o1 = vspec(1)
        odim = batch
    out_specs = (
        [h53] * 14
        + [eq_spec] * 2
        + [o1]
        + [h53] * 2
        + [vspec(1)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((C.N_SC, hdim), jnp.float32)] * 14
        + [jax.ShapeDtypeStruct((C.N_BLOCKS, C.N_SC, eq_dim), eq_dtype)] * 2
        + [jax.ShapeDtypeStruct((1, odim), jnp.float32)]
        + [jax.ShapeDtypeStruct((C.N_SC, hdim), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, batch), jnp.float32)]
    )
    if stream_sums:
        out_specs = list(out_specs) + [stub(8)]
        out_shape = list(out_shape) + [
            jax.ShapeDtypeStruct((8, LANES), jnp.float32)
        ]
    return pl.pallas_call(
        functools.partial(_gen_kernel, snr_db=snr_db, rms=float(rms),
                          n_taps=n_taps, stream_sums=stream_sums,
                          probe=probe),
        grid=(ntile,),
        in_specs=[tspec, tspec, pspec, pspec, cspec, cspec, wispec, wispec,
                  sspec],
        out_specs=out_specs,
        out_shape=out_shape,
    )(
        txs_r, txs_i, tpc_r, tpc_i,
        jnp.asarray(wcr), jnp.asarray(wci),
        jnp.asarray(wstack.real, jnp.float32),
        jnp.asarray(wstack.imag, jnp.float32),
        jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1)),
    )


def _pack(outs):
    res = {}
    for i, name in enumerate(_OUT_NAMES):
        res[name] = Cplx(outs[2 * i], outs[2 * i + 1])
    eq_r, eq_i, ow2, htr, hti, chk = outs[14:20]
    res["eq"] = Cplx(eq_r, eq_i)
    res["ow2"] = ow2[0]
    res["h_true"] = Cplx(htr, hti)
    res["checksum"] = chk[0]
    if len(outs) > 20:
        res["sums"] = outs[20]    # (8, LANES): 7×Σ|ĥ−h|² rows + Σ|h|²
    return res


def fused_gen_chain(seed, batch: int, txs: Cplx, tpre: Cplx,
                    snr_db: float = 20.0, eq_dtype=jnp.bfloat16,
                    channel_model: str | None = None,
                    stream_sums: bool = False, probe: str = "full"):
    """Generate ``batch`` frames in-kernel and run the full chain.

    seed: int32 scalar (traced OK) — deterministic stream per (seed, tile).
    txs: (53, 16) tx block spectra; tpre: (53, 1) (see
    kernels.fused_chain.tx_spectra).  ``channel_model`` ∈ {None, 'A'..'E'}
    selects the ETSI power-delay profile (ops/channel.py).  Returns the
    lane-major output dict of fused_rx_chain_txconst plus ``h_true``
    (53, B) Cplx.

    ``stream_sums=True`` is the streaming configuration: an extra
    ``sums`` output (8, LANES) carries the per-lane Σ|ĥ−h|² of every
    estimator (+ Σ|h|²) accumulated across all tiles IN the kernel,
    while the full h planes / eq / ow2 / h_true collapse to single
    sample tiles (the last tile's values — the persisted record) and
    only the state-carrying checksum leaves at batch width.  The stream
    is HBM-output-bound; this removes ~all of that traffic.

    ``probe`` (static, default "full") swaps parts of the in-kernel frame
    synthesis for deterministic stand-ins — the perf-anatomy knob for
    scripts/bench_stream.py ONLY; any probe ≠ "full" produces
    wrong-by-design outputs and must never reach a production stream.
    """
    assert batch % LANES == 0, (batch, LANES)
    assert txs.shape == (C.N_SC, NB_PAD), txs.shape
    assert tpre.shape == (C.N_SC, 1), tpre.shape
    if not on_tpu():
        assert probe == "full", "probe variants are TPU-kernel-only"
        return _gen_chain_jax(seed, batch, txs, tpre, snr_db, eq_dtype,
                              channel_model, stream_sums)
    outs = _gen_call(txs.re, txs.im, tpre.re, tpre.im, seed,
                     batch=batch, snr_db=float(snr_db), eq_dtype=eq_dtype,
                     channel_model=channel_model, stream_sums=stream_sums,
                     probe=probe)
    return _pack(outs)


@functools.partial(jax.jit, static_argnames=("batch", "snr_db", "eq_dtype",
                                             "channel_model", "stream_sums"))
def _gen_chain_jax(seed, batch, txs, tpre, snr_db, eq_dtype,
                   channel_model=None, stream_sums=False):
    """Plain-JAX twin for non-TPU backends: same distributions and chain
    math (different PRNG bit streams).  Frequency-domain, lane-major."""
    from tpu80211.pipeline import sc

    key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.asarray(seed, jnp.int32))
    k_t, k_n = jax.random.split(key)

    tscale = jnp.asarray(_pdp_scale(channel_model))
    tn = jax.random.normal(k_t, (2, tscale.shape[0], batch), jnp.float32)
    wcr, wci = _cfr_mats(tscale.shape[0])
    wcr = jnp.asarray(wcr)
    wci = jnp.asarray(wci)
    t_re = tn[0] * tscale
    t_im = tn[1] * tscale
    h = Cplx(wcr @ t_re - wci @ t_im, wcr @ t_im + wci @ t_re)

    sigma_t2 = (10.0 ** (-snr_db / 10.0)) / C.N_FFT
    nsc = np.float32(np.sqrt(C.N_FFT * sigma_t2 / 2.0))
    nois = jax.random.normal(
        k_n, (2, 2 + C.N_BLOCKS, C.N_SC, batch), jnp.float32) * nsc

    tpre_b = Cplx(tpre.re, tpre.im)
    clean = tpre_b * h
    n1 = Cplx(nois[0, 0], nois[1, 0])
    n2 = Cplx(nois[0, 1], nois[1, 1])
    rpre = clean + (n1 + n2) * 0.5
    d = n2 - n1
    ow2 = jnp.sum(d.abs2(), axis=0) / (2.0 * C.N_FFT * C.N_SC)  # (batch,)

    h_lt = sc.lt_ls(Cplx(jnp.broadcast_to(tpre.re, (C.N_SC, batch)).T,
                         jnp.broadcast_to(tpre.im, (C.N_SC, batch)).T),
                    Cplx(rpre.re.T, rpre.im.T))  # (batch, 53)

    tx_blocks_r = jnp.broadcast_to(
        txs.re[:, :C.N_BLOCKS].T[None], (batch, C.N_BLOCKS, C.N_SC))
    tx_blocks_i = jnp.broadcast_to(
        txs.im[:, :C.N_BLOCKS].T[None], (batch, C.N_BLOCKS, C.N_SC))
    tx_blocks = Cplx(tx_blocks_r, tx_blocks_i)
    hb = Cplx(h.re.T[:, None, :], h.im.T[:, None, :])
    nb = Cplx(jnp.transpose(nois[0, 2:], (2, 0, 1)),
              jnp.transpose(nois[1, 2:], (2, 0, 1)))
    rx_blocks = tx_blocks * hb + nb

    out = sc.rx_chain_freq(
        Cplx(jnp.broadcast_to(tpre.re, (C.N_SC, batch)).T,
             jnp.broadcast_to(tpre.im, (C.N_SC, batch)).T),
        Cplx(rpre.re.T, rpre.im.T),
        tx_blocks, rx_blocks, ow2,
        wiener_model=channel_model, wiener_snr_db=snr_db,
    )
    res = {}
    for name in _OUT_NAMES:
        v = getattr(out, name)
        res[name] = Cplx(v.re.T, v.im.T)
    res["eq"] = Cplx(jnp.transpose(out.eq.re, (1, 2, 0)).astype(eq_dtype),
                     jnp.transpose(out.eq.im, (1, 2, 0)).astype(eq_dtype))
    res["ow2"] = ow2
    res["h_true"] = h
    chk = res["ow2"] + sum(
        jnp.sum(res[n].re + res[n].im, axis=0) for n in _OUT_NAMES
    ) + jnp.sum(res["eq"].re.astype(jnp.float32)
                + res["eq"].im.astype(jnp.float32), axis=(0, 1))
    res["checksum"] = chk
    if stream_sums:
        # match the kernel contract exactly: (8, LANES) per-lane sums
        # accumulated over tiles, and the non-checksum outputs collapsed
        # to the LAST tile's values
        def lane_sums(vals):  # (B,) → (LANES,) summed over tile groups
            return vals.reshape(-1, LANES).sum(axis=0)

        rows = [
            lane_sums(jnp.sum((res[n] - h).abs2(), axis=0))
            for n in _OUT_NAMES
        ] + [lane_sums(jnp.sum(h.abs2(), axis=0))]
        res["sums"] = jnp.stack(rows)
        for n in _OUT_NAMES:
            res[n] = res[n][:, -LANES:]
        res["eq"] = res["eq"][:, :, -LANES:]
        res["ow2"] = res["ow2"][-LANES:]
        res["h_true"] = res["h_true"][:, -LANES:]
    return res
