#!/usr/bin/env python
"""Benchmark: estimated + equalized frames/s of the full RX chain on the
attached device.

Runs the full split-complex RX chain (time-domain packets → block
extraction → all seven estimators (LT-LS, PS linear/cubic/sinc/spline/
Wiener, PS-MMSE) → blended equalization (PS-Linear blend, the golden
model's choice, WiFi_RX.m:60), tpu80211/pipeline/sc.py) and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

The default invocation measures BOTH production shapes and reports the
tx-constant fused kernel as the headline (VERDICT.md round-2 weak#1: the
recorded number must BE the documented headline number):

  * "txconst" — every frame shares one known transmit packet, passed as
    a replicated spectrum constant (the realistic production shape; the
    reference itself replays a single fixed frame, inputs.h).  Batch
    65536 so the ~1.3 ms/step amortizes per-step dispatch and both
    fences converge;
  * "default" — per-frame tx packets (the general case), batch 32768.

Methodology (honest wall-clock over a remote/tunneled chip):
  * a base frame batch is synthesized on device once; the timed loop feeds
    each iteration a scalar perturbation DERIVED FROM THE PREVIOUS
    ITERATION'S OUTPUT, so every step is data-dependent on the last —
    no caching, no deduplication, no reordering is possible;
  * the fence is a device→host READBACK of the final scalar —
    `block_until_ready` on this runtime acknowledges dispatch, it does not
    await completion (measured: 64 "fenced" iterations in 1.7 ms);
    reading the value forces the whole dependency chain to finish;
  * two loop lengths (iters and 2·iters) are timed and the MARGINAL cost
    (dt2 − dt1)/iters cancels fixed RTT/queue overheads;
  * a SECOND independent fence — the marginal over BATCH SIZE at fixed
    loop length — corroborates along an orthogonal axis;
  * the reference instead sums thread CPU ticks with clock()
    (main_mpi.c:1015-1081) — not comparable across thread counts.

Baseline: the reference's best published configuration — 20 ranks in pure
frame-parallel mode with MPI+OpenMP, 5.49e6 clock ticks ≈ 5.49 s CPU per
frame for the MMSE estimator alone (main_mpi.c:1053-1055; BASELINE.md) ⇒
0.1822 frames/s.  vs_baseline = our frames/s ÷ that.
"""

from __future__ import annotations

import json
import sys
import time

import jax

# persistent compile cache: the fused-kernel compile through the tunnel
# costs minutes; cache it across bench invocations
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu80211-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from tpu80211 import constants as C
from tpu80211.cplx import Cplx
from tpu80211.pipeline import sc

# reference best: 20×1 frame-parallel MPI+OMP sweep row, 5.49e6 ticks/frame
# (main_mpi.c:1053-1055, CLOCKS_PER_SEC = 1e6)
BASELINE_FRAMES_PER_S = 1.0 / 5.49


def _gen(key, batch: int, dtype=jnp.float32):
    """Synthesize a random Cplx frame batch on device."""
    ks = jax.random.split(key, 8)

    def cplx(k1, k2, shape):
        return Cplx(
            jax.random.normal(k1, shape, jnp.float32).astype(dtype),
            jax.random.normal(k2, shape, jnp.float32).astype(dtype),
        )

    return (
        cplx(ks[0], ks[1], (batch, C.PACKET_SAMPLES)),
        cplx(ks[2], ks[3], (batch, C.PACKET_SAMPLES)),
        cplx(ks[4], ks[5], (batch, C.PREAMBLE_SAMPLES)),
        cplx(ks[6], ks[7], (batch, C.PREAMBLE_SAMPLES)),
    )


def _step(args, s, inc):
    """One serialized iteration: perturb inputs by (s + inc), run the full
    chain, reduce to one scalar that feeds the next iteration."""
    eps = s + inc
    # keep the storage dtype: bf16 * f32-scalar promotes to f32, which
    # would silently turn a --bf16 run into an f32 chain
    args = jax.tree.map(lambda x: (x * (1.0 + eps)).astype(x.dtype), args)
    out = sc.rx_chain(*args)
    flat = jnp.stack(jax.tree.leaves(jax.tree.map(jnp.sum, out)))
    return jnp.tanh(jnp.sum(flat)) * 1e-9


def _step_fused(args, s, inc):
    """Serialized iteration through the fused whole-chain Pallas kernel
    (lane-major layout, kernels/fused_chain.py).

    The perturbation is fused INTO the kernel (inputs scaled by (1+eps)
    on load) and the fence reads the kernel's per-frame checksum output —
    a Pallas call is a fusion barrier, so doing either outside the kernel
    costs whole extra HBM passes of pure measurement overhead.  Every
    step remains data-dependent on the previous one (eps = f(prev out))."""
    from tpu80211.kernels.fused_chain import fused_rx_chain_lane_major

    out = fused_rx_chain_lane_major(*args, eps=s + inc)
    return jnp.tanh(jnp.sum(out["checksum"])) * 1e-9


def _step_txconst(args, s, inc):
    """Serialized iteration through the tx-constant fused kernel: the
    whole stream shares one known transmit packet passed as precomputed
    spectra — input HBM traffic halves (the realistic production shape;
    the reference's own runs replay a single fixed frame, inputs.h)."""
    from tpu80211.kernels.fused_chain import fused_rx_chain_txconst

    txs, tpre, rx_pkt, rx_lp = args
    out = fused_rx_chain_txconst(txs, tpre, rx_pkt, rx_lp, eps=s + inc)
    return jnp.tanh(jnp.sum(out["checksum"])) * 1e-9


def _step_txserve(args, s, inc):
    """tx-constant SERVING configuration: only h_wiener/h_mmse/eq/ow2/cfo
    are written at batch width (the five diagnostic h planes collapse to
    one tile) — the minimum-HBM production shape."""
    from tpu80211.kernels.fused_chain import fused_rx_chain_txconst

    txs, tpre, rx_pkt, rx_lp = args
    out = fused_rx_chain_txconst(txs, tpre, rx_pkt, rx_lp, eps=s + inc,
                                 serve=True)
    return jnp.tanh(jnp.sum(out["checksum"])) * 1e-9


def _step_txi8(args, s, inc):
    """tx-constant + int8 (ADC-true) rx ingestion + serving outputs —
    the minimum-HBM shape on BOTH sides: 8-bit sample words in (what a
    real ADC produces), only the served estimates out."""
    from tpu80211.kernels.fused_chain import fused_rx_chain_txconst

    txs, tpre, rx_pkt, rx_lp, lsb = args
    out = fused_rx_chain_txconst(txs, tpre, rx_pkt, rx_lp, eps=s + inc,
                                 serve=True, lsb=lsb)
    return jnp.tanh(jnp.sum(out["checksum"])) * 1e-9


def _bench_dense_mmse(iters: int = 24, batch: int = 8192) -> float:
    """Apples-to-apples figure for the op the reference actually times —
    the dense regularized 53×53 solve (BASELINE.json configs[3]) — via the
    panel-blocked Cholesky kernel, serialized marginal methodology.
    The measured kernel's output is asserted against numpy before timing
    (VERDICT round-3 weak#2: an accuracy-unchecked bench would record a
    silently-wrong kernel's throughput)."""
    import numpy as np

    from tpu80211.kernels.mmse_solve import fused_rank1_solve

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    u = Cplx(jax.random.normal(ks[0], (batch, 53), jnp.float32),
             jax.random.normal(ks[1], (batch, 53), jnp.float32))
    rx = Cplx(jax.random.normal(ks[2], (batch, 53), jnp.float32),
              jax.random.normal(ks[3], (batch, 53), jnp.float32))
    ow2 = jnp.full((batch,), 0.37, jnp.float32)

    @jax.jit
    def step(s, inc):
        z = fused_rank1_solve(
            Cplx(u.re * (1.0 + s + inc), u.im), rx, ow2, method="chol")
        return jnp.tanh(jnp.sum(z.re) + jnp.sum(z.im)) * 1e-9

    # accuracy gate on the exact kernel being timed (spot lanes vs numpy)
    got = np.asarray(fused_rank1_solve(u, rx, ow2, method="chol").to_complex())
    un = np.asarray(u.to_complex())
    rn = np.asarray(rx.to_complex())
    for i in range(0, batch, max(1, batch // 7)):
        a = 0.37 * np.eye(53) + np.outer(un[i], np.conj(un[i]))
        want = np.linalg.solve(a, rn[i])
        rel = float(np.abs(got[i] - want).max() / np.abs(want).max())
        assert rel < 5e-5, ("dense mmse kernel accuracy", i, rel)

    incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
    s = step(jnp.float32(0.0), incs[0])
    float(s)

    def run(n):
        t0 = time.perf_counter()
        sv = s
        for i in range(n):
            sv = step(sv, incs[i])
        float(sv)
        return time.perf_counter() - t0

    dt = max(run(2 * iters) - run(iters), 1e-9)
    return batch * iters / dt


def _raw_workload(batch: int, ns: int = 2048, dtype=jnp.bfloat16):
    """B raw ns-sample streams, each carrying the shipped capture's frame
    at a random offset over 40 dB-down AWGN (scripts/bench_raw_stream.py's
    workload — the raw-sample stage the reference names but never builds,
    WiFi_RX.m:7 `threshold`)."""
    import numpy as np

    from tpu80211.datasets.loader import load_capture
    from tpu80211.kernels.fused_chain import tx_spectra
    from tpu80211.ops.detect import lts_time_symbol

    cap = load_capture()
    rng = np.random.default_rng(0)
    frame = np.concatenate([cap.rx_lptot, cap.rx_packet])
    x = (rng.standard_normal((batch, ns))
         + 1j * rng.standard_normal((batch, ns))) * 1e-4
    offs = rng.integers(40, ns - 1400, batch)
    for i, o in enumerate(offs):
        x[i, o : o + 1360] += frame
    xt = np.ascontiguousarray(x.T)
    xc = Cplx(jnp.asarray(xt.real, dtype), jnp.asarray(xt.imag, dtype))
    lts = lts_time_symbol(cap.tx_lptot)
    lts = Cplx(jnp.asarray(lts.re, jnp.float32),
               jnp.asarray(lts.im, jnp.float32))
    txs, tpre = tx_spectra(Cplx.from_complex(cap.tx_packet, jnp.float32),
                           Cplx.from_complex(cap.tx_lptot, jnp.float32))
    evm_den = float(np.sum(np.asarray(txs.re[:, :C.N_BLOCKS]) ** 2
                           + np.asarray(txs.im[:, :C.N_BLOCKS]) ** 2))
    return xc, offs, lts, txs, tpre, evm_den


def _marginal(step, iters, s0, incs, with_single=False):
    """Median-of-3 serialized loop-length marginal (bench.py docstring).
    ``with_single=True`` also returns the best single-loop wall time —
    the congestion diagnostic: a healthy run has marginal ≲ single-loop
    per-step; a sustained tunnel-slow window inflates the marginal far
    above it (observed once: a 10.6M raw32 row whose isolated re-run
    read 17.9M)."""
    def run(n):
        t0 = time.perf_counter()
        sv = s0
        for i in range(n):
            sv = step(sv, incs[i])
        float(sv)
        return time.perf_counter() - t0

    reps = 3
    singles = []
    margins = []
    for _ in range(reps):
        t1 = run(iters)
        t2 = run(2 * iters)
        singles.append(t1 / iters)
        margins.append(max(t2 - t1, 1e-9))
    marg = sorted(margins)[reps // 2]
    if with_single:
        return marg, min(singles)
    return marg


def _bench_raw_system(iters: int = 24, batch: int = 32768,
                      decimate: int = 16) -> dict:
    """ONE-kernel raw receiver (kernels/raw_chain.py): detect → barrel
    align → 7-estimator chain in a single Pallas invocation, decimated
    coarse metric — the complete raw-sample system the reference's
    WiFi_RX.m:7 promises (`threshold = 4e-3`) but never composes.

    In-run correctness gates BEFORE timing (VERDICT round-4 #1), on the
    exact arrays the timed loop consumes: every stream detected, every
    detected start inside the [-4, -2] band the 4-sample advance
    targets, in-kernel Σ|eq − tx|² EVM bounded, checksum finite."""
    import numpy as np

    from tpu80211.kernels.raw_chain import raw_rx_txconst_fused

    x, offs, lts, txs, tpre, evm_den = _raw_workload(batch)
    # production equalizer (equalize_with="h_mmse"): the default
    # h_linear blend diverges on deep fades (squared-EVM tails dominate
    # the rms; median is still ~0.29) and is not the serving shape.
    # ``decimate``: 16 = the sensitivity-record default; 32 = the
    # recommended high-SNR serving stride (PERF.md "Raw-kernel anatomy")
    out = raw_rx_txconst_fused(x, lts, txs, tpre, stream_sums=True,
                               equalize_with="h_mmse", decimate=decimate)
    det = np.asarray(out["detected"])
    err = np.asarray(out["start"]) - offs
    assert det.all(), ("raw system missed packets", int((~det).sum()))
    assert err.min() >= -4 and err.max() <= -2, (err.min(), err.max())
    assert np.isfinite(np.asarray(out["checksum"])).all()
    evm_rms = float(np.sqrt(np.asarray(out["evm_sums"]).sum()
                            / (batch * evm_den)))
    # measured 0.022 on the capture's real channel (the residual is
    # channel-estimation error — 4 pilots can't capture it fully)
    assert evm_rms < 0.1, ("raw system EVM", evm_rms)

    @jax.jit
    def step_x(xr, xi, s, inc):
        r = raw_rx_txconst_fused(Cplx(xr, xi), lts, txs, tpre,
                                 eps=s + inc, stream_sums=True,
                                 equalize_with="h_mmse", decimate=decimate)
        return jnp.tanh(jnp.sum(r["checksum"])) * 1e-9

    def step(s, inc):
        return step_x(x.re, x.im, s, inc)

    incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
    s = step(jnp.float32(0.0), incs[0])
    float(s)
    dt, single = _marginal(step, iters, s, incs, with_single=True)
    return {
        "frames_per_s": round(batch * iters / dt, 1),
        "vs_baseline": round(batch * iters / dt / BASELINE_FRAMES_PER_S, 1),
        "ms_per_step": round(1e3 * dt / iters, 4),
        "ms_per_step_single_loop": round(1e3 * single, 4),
        "batch": batch,
        "iters": iters,
        "decimate_stride": decimate,
        "gates": {
            "detect_rate": 1.0,
            "timing_err_band": [int(err.min()), int(err.max())],
            "evm_rms": round(evm_rms, 4),
        },
    }


def _bench_gen_raw_system(iters: int = 16, batch: int = 32768) -> dict:
    """Fully generative raw system (kernels/raw_gen_chain.py): channel
    synthesis → waveform → placement → AWGN → detection → alignment →
    chain, all in ONE kernel, nothing read from the host.

    Gates before timing: detection rate 1.0 at SNR 20, timing-in-band
    ≥ 0.85 (random dispersive channels legitimately shift fine timing
    within the CP — artifacts/raw_system_quality.json), detected-stream
    EVM < 0.1 with the production equalizer (equalize_with="h_mmse";
    measured 0.050 — the default h_linear blend diverges on deep
    channel fades and is not the serving configuration), checksum
    finite."""
    import numpy as np

    from tpu80211.datasets.loader import load_capture
    from tpu80211.kernels.fused_chain import tx_spectra
    from tpu80211.kernels.raw_gen_chain import gen_raw_system
    from tpu80211.ops.detect import lts_time_symbol

    cap = load_capture()
    lts = lts_time_symbol(Cplx.from_complex(cap.tx_lptot))
    lts = Cplx(jnp.asarray(lts.re, jnp.float32),
               jnp.asarray(lts.im, jnp.float32))
    txs, tpre = tx_spectra(Cplx.from_complex(cap.tx_packet, jnp.float32),
                           Cplx.from_complex(cap.tx_lptot, jnp.float32))
    evm_den = float(np.sum(np.asarray(txs.re[:, :C.N_BLOCKS]) ** 2
                           + np.asarray(txs.im[:, :C.N_BLOCKS]) ** 2))

    out = gen_raw_system(jnp.int32(7), batch, txs, tpre, lts,
                         equalize_with="h_mmse")
    det = np.asarray(out["detected"])
    err = np.asarray(out["start"]) - np.asarray(out["offsets"])
    in_band = (err >= -4) & (err <= -2)
    detect_rate = float(det.mean())
    in_band_rate = float(in_band.mean())
    assert detect_rate == 1.0, ("gen raw detect", detect_rate)
    assert in_band_rate >= 0.85, ("gen raw timing", in_band_rate)
    assert np.isfinite(np.asarray(out["checksum"])).all()
    evm_s = np.asarray(out["evm_sums"])
    evm_rms = float(np.sqrt(evm_s[det].mean() / evm_den))
    assert evm_rms < 0.1, ("gen raw EVM", evm_rms)

    @jax.jit
    def step(s, i):
        # serialization: the kernel seed is data-dependent on the
        # previous step's checksum readback chain (stream.py's recipe)
        kseed = (jnp.asarray(7 + i, jnp.int32)
                 + (s * jnp.float32(1e9)).astype(jnp.int32))
        r = gen_raw_system(kseed, batch, txs, tpre, lts,
                           equalize_with="h_mmse")
        return jnp.tanh(jnp.sum(r["checksum"])) * 1e-9

    incs = list(range(2 * iters))
    s = step(jnp.float32(0.0), incs[0])
    float(s)
    dt, single = _marginal(step, iters, s, incs, with_single=True)
    return {
        "frames_per_s": round(batch * iters / dt, 1),
        "vs_baseline": round(batch * iters / dt / BASELINE_FRAMES_PER_S, 1),
        "ms_per_step": round(1e3 * dt / iters, 4),
        "ms_per_step_single_loop": round(1e3 * single, 4),
        "batch": batch,
        "iters": iters,
        "snr_db": 20.0,
        "gates": {
            "detect_rate": detect_rate,
            "timing_in_band_rate": round(in_band_rate, 4),
            "evm_rms_detected": round(evm_rms, 4),
        },
    }


def _make_inputs(batch: int, dtype, fused: bool, txconst: bool):
    base = jax.jit(_gen, static_argnames=("batch", "dtype"))(
        jax.random.PRNGKey(0), batch, dtype
    )
    jax.block_until_ready(base)
    if fused:
        # fused kernel is lane-major (frame axis last); it accepts bf16
        # storage (upcasts to f32 in VMEM)
        base = jax.tree.map(lambda x: x.T, base)
    if txconst:
        from tpu80211.kernels.fused_chain import quantize_i8, tx_spectra

        tx_pkt, rx_pkt, tx_lp, rx_lp = base
        txs, tpre = tx_spectra(
            Cplx(tx_pkt.re[:, 0].astype(jnp.float32),
                 tx_pkt.im[:, 0].astype(jnp.float32)),
            Cplx(tx_lp.re[:, 0].astype(jnp.float32),
                 tx_lp.im[:, 0].astype(jnp.float32)),
        )
        if txconst == "i8":
            qp, lsb = quantize_i8(Cplx(rx_pkt.re.astype(jnp.float32),
                                       rx_pkt.im.astype(jnp.float32)))
            ql, _ = quantize_i8(Cplx(rx_lp.re.astype(jnp.float32),
                                     rx_lp.im.astype(jnp.float32)), lsb)
            base = (txs, tpre, qp, ql, lsb)
        else:
            base = (txs, tpre, rx_pkt, rx_lp)
    return base


def bench_chain(path: str, batch: int, iters: int, dtype) -> dict:
    """Measure one chain path with the full serialized + batch-marginal
    methodology.  ``path`` ∈ {"xla", "fused", "txconst", "txserve",
    "txi8"}."""
    fused = path != "xla"
    txconst = ("i8" if path == "txi8"
               else path in ("txconst", "txserve"))
    base = _make_inputs(batch, dtype, fused, txconst)
    fn = jax.jit({"xla": _step, "fused": _step_fused,
                  "txconst": _step_txconst, "txserve": _step_txserve,
                  "txi8": _step_txi8}[path])
    incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
    s = fn(base, jnp.float32(0.0), incs[0])
    float(s)  # full warmup incl. readback path

    def run(n, args):
        t0 = time.perf_counter()
        sv = s
        for i in range(n):
            sv = fn(args, sv, incs[i])
        float(sv)  # readback = the only trustworthy completion fence here
        return time.perf_counter() - t0

    # repeat each marginal measurement and take the median — a single
    # (dt2 − dt1) difference through the tunnel carries ±ms dispatch
    # jitter, the same hygiene bench_latency.py applies (round-3)
    reps = 3
    margins = sorted(
        max(run(2 * iters, base) - run(iters, base), 1e-9)
        for _ in range(reps)
    )
    dt = margins[reps // 2]  # marginal time of `iters` extra iterations
    frames_per_s = batch * iters / dt
    dt1 = run(iters, base)

    # SECOND, independent corroboration (VERDICT round-1 weak#4): marginal
    # over BATCH SIZE at fixed loop length — time the same loop at B and
    # B/2 and attribute the difference to the extra B/2 frames.  Cancels
    # fixed overhead along an axis orthogonal to the loop-length marginal.
    half = _make_inputs(batch // 2, dtype, fused, txconst)
    s_half = fn(half, jnp.float32(0.0), incs[0])
    float(s_half)
    bmargins = sorted(
        max(run(iters, base) - run(iters, half), 1e-9) for _ in range(reps)
    )
    frames_per_s_bmarg = (batch // 2) * iters / bmargins[reps // 2]

    bf16 = dtype == jnp.bfloat16
    return {
        "value": round(frames_per_s, 1),
        "vs_baseline": round(frames_per_s / BASELINE_FRAMES_PER_S, 1),
        "batch": batch,
        "iters": iters,
        "dtype": "bf16" if bf16 else "f32",
        "path": {"xla": "xla", "fused": "fused_pallas",
                 "txconst": "fused_pallas_txconst",
                 "txserve": "fused_pallas_txconst_serve",
                 "txi8": "fused_pallas_txconst_i8_serve"}[path],
        "wall_s": round(dt, 4),
        "wall_s_single_loop": round(dt1, 4),
        "frames_per_s_batch_marginal": round(frames_per_s_bmarg, 1),
        "fence_agreement": round(frames_per_s_bmarg / frames_per_s, 3),
    }


def _metric_name(row: dict) -> str:
    return (
        "full-RX-chain (7 estimators incl. Wiener + blended equalization) "
        f"frames/s, single chip, serialized [{row['path']}, "
        f"{'bf16-storage/f32-compute' if row['dtype'] == 'bf16' else 'f32'}]"
    )


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    import os as _os

    if _os.environ.get("TPU80211_BENCH_PATH") == "xla":
        sys.argv.append("--xla")
    bf16 = "--f32" not in sys.argv[1:]
    if "--bf16" in sys.argv[1:]:
        bf16 = True
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    raw_flags = [f for f in ("--raw", "--raw32", "--genraw")
                 if f in sys.argv[1:]]
    if raw_flags:
        # raw-sample system rows (single path, fresh-process isolation)
        assert len(raw_flags) == 1, (
            f"pick one of --raw/--raw32/--genraw, got {raw_flags}")
        flag = raw_flags[0]
        kw = {"batch": int(argv[0])} if argv else {}
        if len(argv) > 1:
            kw["iters"] = int(argv[1])
        if flag == "--genraw":
            fn = _bench_gen_raw_system
            name = ("fully generative in-kernel raw system "
                    "(synthesize+detect+align+chain)")
        else:
            fn = _bench_raw_system
            name = "one-kernel raw receiver (detect+align+7-estimator chain)"
            if flag == "--raw32":
                kw["decimate"] = 32
                name += " [stride-32 serving]"
        row = fn(**kw)
        print(json.dumps({
            "metric": f"{name} frames/s, single chip, serialized, gated",
            "unit": "frames/s", **row, "device": str(jax.devices()[0]),
        }))
        return

    explicit = [f for f in ("--xla", "--fused", "--txconst", "--txserve",
                            "--txi8")
                if f in sys.argv[1:]]
    if explicit or argv:
        # single-path run with explicit shape (smoke tests, sweeps)
        path = ("xla" if "--xla" in explicit
                else "txi8" if "--txi8" in explicit
                else "txserve" if "--txserve" in explicit
                else "txconst" if "--txconst" in explicit else "fused")
        batch = int(argv[0]) if len(argv) > 0 else (
            65536 if path in ("txconst", "txserve", "txi8") else 32768)
        iters = int(argv[1]) if len(argv) > 1 else 48
        row = bench_chain(path, batch, iters, dtype)
        result = {"metric": _metric_name(row), "unit": "frames/s", **row}
    else:
        # DEFAULT: measure both production shapes; headline = tx-const
        # (the declared production configuration, PERF.md) at batch 65536
        # so the ~1.3 ms step amortizes dispatch and the fences converge.
        # Each path runs in a FRESH subprocess: measured in-process, the
        # second path ran ~10× slow with broken fences (leftover device
        # buffers/executables from the first path degrade the runtime —
        # single-path numbers reproduce cleanly every time).
        import subprocess

        def run_sub(args):
            out = subprocess.run(
                [sys.executable, __file__, *args, "--no-dense"]
                + (["--f32"] if not bf16 else []),
                capture_output=True, text=True, timeout=3600, check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        tx = run_sub(["65536", "64", "--txconst"])
        dflt = run_sub(["32768", "48", "--fused"])
        serve = run_sub(["65536", "64", "--txserve"])
        i8 = run_sub(["65536", "64", "--txi8"])
        rows = [tx, dflt, serve, i8]
        # raw-sample system rows (VERDICT round-4 #1: the flagship raw
        # numbers must be driver-re-verified every round, with their
        # correctness gates, like everything else).  TPU only — the CPU
        # fallback at this batch measures nothing meaningful.
        from tpu80211.kernels import on_tpu as _on_tpu

        raw = raw32 = genraw = None
        if _on_tpu():
            raw = run_sub(["--raw"])
            raw32 = run_sub(["--raw32"])
            genraw = run_sub(["--genraw"])
            rows += [raw, raw32, genraw]
        for row in rows:
            for k in ("metric", "unit", "device"):
                row.pop(k, None)
        result = {
            "metric": _metric_name(tx),
            "unit": "frames/s",
            **tx,
            "default_path": dflt,
            "serving_path": serve,
            "i8_serving_path": i8,
        }
        if raw is not None:
            result["raw_system"] = raw
            result["raw_system_stride32"] = raw32
            result["gen_raw_system"] = genraw

    result["device"] = str(jax.devices()[0])
    # apples-to-apples figure for the op the reference times (MMSE dense
    # solve alone, BASELINE.json configs[3]) — VERDICT round-1 weak#5.
    # TPU only: the CPU fallback solver at this batch would dominate the
    # smoke-test runtime without measuring anything meaningful.
    from tpu80211.kernels import on_tpu

    if "--no-dense" not in sys.argv[1:] and on_tpu():
        result["dense_mmse_chol_solves_per_s"] = round(_bench_dense_mmse(), 1)
        result["dense_mmse_vs_baseline"] = round(
            result["dense_mmse_chol_solves_per_s"] / BASELINE_FRAMES_PER_S, 1
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
