#!/usr/bin/env python
"""Per-stage cost anatomy of the one-kernel raw receiver (VERDICT r4 #7).

The profiler proves >99% of the raw step's 2.0 ms device time is inside
the single fused kernel (artifacts/profiler_trace.json,
raw_receiver_B32768_bf16) — but a trace cannot decompose ONE Pallas
kernel.  This script measures the stage floors empirically instead,
each configuration in a FRESH subprocess (in-process contamination was
re-confirmed this round: the same raw step measured 2.4–4.6 ms when
preceded by other compiled paths in one process):

  * chain-only: the tx-const chain on pre-aligned inputs at the same
    batch — the receiver's lower bound if detection were free;
  * detect-only at Schmidl&Cox decimation strides 16/32/64 — the
    detection stage's own floor vs its coarse-metric granularity
    (stride ≤ 64 cannot miss the ≥160-sample plateau; fine timing is
    full-resolution either way, gates assert band-exactness);
  * the full fused receiver at strides 16/32/64.

Every timed configuration asserts its gates first (all streams
detected, fine timing in the [-4,-2] band, EVM) — a fast-but-wrong
config cannot enter the record.

Writes artifacts/raw_kernel_anatomy.json.
Usage: python scripts/bench_raw_anatomy.py [batch] [iters]
       python scripts/bench_raw_anatomy.py one <config> ...   (internal)
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve()
ROOT = HERE.parents[1]
sys.path.insert(0, str(ROOT))

CONFIGS = ("chain", "detect16", "detect32", "detect64",
           "raw16", "raw32", "raw64", "raw_i8_serve_stride32")


def mode_one(config: str, batch: int, iters: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu80211-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    import numpy as np

    import bench
    from tpu80211.cplx import Cplx

    x, offs, lts, txs, tpre, evm_den = bench._raw_workload(batch)

    def marg(step):
        # bench._marginal IS the repo's one serialized-marginal loop
        # (median-of-3); per-step time = its total / iters
        incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
        s = step(jnp.float32(0.0), incs[0])
        float(s)
        return bench._marginal(step, iters, s, incs) / iters

    if config == "chain":
        from tpu80211.kernels.detect_kernel import detect_and_align
        from tpu80211.kernels.fused_chain import fused_rx_chain_txconst

        _, lp, pkt = detect_and_align(x, lts)  # pre-align once, untimed

        @jax.jit
        def step_x(pr, pi_, lr, li, s, inc):
            out = fused_rx_chain_txconst(txs, tpre, Cplx(pr, pi_),
                                         Cplx(lr, li), eps=s + inc)
            return jnp.tanh(jnp.sum(out["checksum"])) * 1e-9

        dt = marg(lambda s, inc: step_x(pkt.re, pkt.im, lp.re, lp.im,
                                        s, inc))
        row = {"config": "chain_only_prealigned"}
    elif config.startswith("detect"):
        from tpu80211.kernels.detect_kernel import detect_streams

        stride = int(config[6:])

        r = detect_streams(x, lts, decimate=stride)
        err = np.asarray(r["start"]) - offs
        assert np.asarray(r["detected"]).all()
        assert err.min() >= -4 and err.max() <= -2, (err.min(), err.max())

        @functools.partial(jax.jit, static_argnames=("dec",))
        def stepd(xr, xi, s, inc, dec):
            eps = s + inc
            xs = Cplx((xr.astype(jnp.float32) * (1.0 + eps)).astype(xr.dtype),
                      xi)
            rr = detect_streams(xs, lts, decimate=dec)
            return (jnp.sum(rr["start"]).astype(jnp.float32) * 1e-9
                    + eps * 0.5)

        dt = marg(lambda s, inc: stepd(x.re, x.im, s, inc, stride))
        row = {"config": f"detect_only_stride{stride}",
               "timing_err_band": [int(err.min()), int(err.max())]}
    elif config == "raw_i8_serve_stride32":
        # the combined serving point: int8 ADC words + serving outputs
        # + stride-32 coarse (halved input HBM)
        from tpu80211.kernels.fused_chain import quantize_i8
        from tpu80211.kernels.raw_chain import raw_rx_txconst_fused

        xq, lsb = quantize_i8(Cplx(x.re.astype(jnp.float32),
                                   x.im.astype(jnp.float32)))
        r = raw_rx_txconst_fused(xq, lts, txs, tpre, lsb=lsb, serve=True,
                                 stream_sums=True, equalize_with="h_mmse",
                                 decimate=32)
        err = np.asarray(r["start"]) - offs
        evm = float(np.sqrt(np.asarray(r["evm_sums"]).sum()
                            / (batch * evm_den)))
        assert np.asarray(r["detected"]).all()
        assert err.min() >= -4 and err.max() <= -2, (err.min(), err.max())
        assert evm < 0.1, evm

        @jax.jit
        def stepq(xr, xi, s, inc):
            rr = raw_rx_txconst_fused(Cplx(xr, xi), lts, txs, tpre,
                                      eps=s + inc, lsb=lsb, serve=True,
                                      stream_sums=True,
                                      equalize_with="h_mmse", decimate=32)
            return jnp.tanh(jnp.sum(rr["checksum"])) * 1e-9

        dt = marg(lambda s, inc: stepq(xq.re, xq.im, s, inc))
        row = {"config": "raw_i8_serve_stride32",
               "timing_err_band": [int(err.min()), int(err.max())],
               "evm_rms": round(evm, 4)}
    else:
        from tpu80211.kernels.raw_chain import raw_rx_txconst_fused

        stride = int(config[3:])

        r = raw_rx_txconst_fused(x, lts, txs, tpre, stream_sums=True,
                                 equalize_with="h_mmse", decimate=stride)
        err = np.asarray(r["start"]) - offs
        evm = float(np.sqrt(np.asarray(r["evm_sums"]).sum()
                            / (batch * evm_den)))
        assert np.asarray(r["detected"]).all()
        assert err.min() >= -4 and err.max() <= -2, (err.min(), err.max())
        assert evm < 0.1, evm

        @functools.partial(jax.jit, static_argnames=("dec",))
        def stepr(xr, xi, s, inc, dec):
            rr = raw_rx_txconst_fused(Cplx(xr, xi), lts, txs, tpre,
                                      eps=s + inc, stream_sums=True,
                                      equalize_with="h_mmse", decimate=dec)
            return jnp.tanh(jnp.sum(rr["checksum"])) * 1e-9

        dt = marg(lambda s, inc: stepr(x.re, x.im, s, inc, stride))
        row = {"config": f"raw_system_stride{stride}",
               "timing_err_band": [int(err.min()), int(err.max())],
               "evm_rms": round(evm, 4)}
    row.update({
        "batch": batch, "iters": iters,
        "per_s": round(batch / dt, 1),
        "ms_per_step": round(1e3 * dt, 4),
        "device": str(jax.devices()[0]),
    })
    print(json.dumps(row))


def mode_sens() -> None:
    """Detection sensitivity vs decimation stride at the noise floor:
    the other axis of the stride trade (the timing rows above only see
    the clean capture workload).  Generative dispersive-channel streams
    (the raw_system_quality.json workload), B=4096/point."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu80211-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu80211.cplx import Cplx
    from tpu80211.datasets import synthetic_sc
    from tpu80211.datasets.loader import load_capture
    from tpu80211.kernels.detect_kernel import detect_streams
    from tpu80211.kernels.fused_chain import tx_spectra
    from tpu80211.ops.detect import lts_time_symbol

    cap = load_capture()
    lts = lts_time_symbol(Cplx.from_complex(cap.tx_lptot))
    lts = Cplx(jnp.asarray(lts.re, jnp.float32),
               jnp.asarray(lts.im, jnp.float32))
    txs, tpre = tx_spectra(Cplx.from_complex(cap.tx_packet, jnp.float32),
                           Cplx.from_complex(cap.tx_lptot, jnp.float32))
    B = 4096
    for snr in (10.0, 0.0, -5.0):
        key = jax.random.PRNGKey(11)
        x, _, offs = synthetic_sc.generate_raw_lane_major(
            key, B, txs, tpre, snr_db=snr, dtype=jnp.float32,
            channel_model="A")
        row = {"snr_db": snr, "detect": {}}
        for dec in (16, 32, 64):
            r = detect_streams(x, lts, decimate=dec)
            det = np.asarray(r["detected"])
            row["detect"][f"s{dec}"] = round(float(det.mean()), 4)
        print(json.dumps(row), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        return mode_one(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    if len(sys.argv) > 1 and sys.argv[1] == "sens":
        return mode_sens()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    rows = []
    for cfg in CONFIGS:
        r = subprocess.run(
            [sys.executable, str(HERE), "one", cfg, str(batch), str(iters)],
            capture_output=True, text=True, timeout=1800, check=True)
        row = json.loads([x for x in r.stdout.splitlines()
                          if x.startswith("{")][-1])
        rows.append(row)
        print(json.dumps(row), flush=True)
    r = subprocess.run([sys.executable, str(HERE), "sens"],
                       capture_output=True, text=True, timeout=1800,
                       check=True)
    sens_rows = [json.loads(x) for x in r.stdout.splitlines()
                 if x.startswith("{")]
    for row in sens_rows:
        print(json.dumps(row), flush=True)
    by = {r["config"]: r for r in rows}
    doc = {
        "metric": "one-kernel raw receiver stage anatomy "
                  "(fresh subprocess per config, serialized marginal)",
        "rows": rows,
        "sensitivity_vs_stride": {
            "workload": "generate_raw_lane_major, channel A, "
                        "B=4096/point (the raw_system_quality.json "
                        "workload)",
            "rows": sens_rows,
            "decision": "default stays stride 16 (matches every "
                        "committed sensitivity artifact); decimate=32 "
                        "recommended high-SNR serving knob; decimate=64 "
                        "trades -5 dB detection for max throughput",
        },
        "floors_ms": {
            "chain_if_detection_were_free":
                by["chain_only_prealigned"]["ms_per_step"],
            "detection_alone_stride16":
                by["detect_only_stride16"]["ms_per_step"],
            "full_system_stride16": by["raw_system_stride16"]["ms_per_step"],
            "fusion_saving": round(
                by["chain_only_prealigned"]["ms_per_step"]
                + by["detect_only_stride16"]["ms_per_step"]
                - by["raw_system_stride16"]["ms_per_step"], 4),
        },
    }
    path = ROOT / "artifacts" / "raw_kernel_anatomy.json"
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"wrote": str(path)}))


if __name__ == "__main__":
    main()
