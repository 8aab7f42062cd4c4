#!/usr/bin/env python
"""System-level streamed throughput: device-resident generation + fused
RX chain + per-batch summary readback (pipeline/stream.py's device
stream).

This is the end-to-end "data in → estimates out" rate of the deployed
system, not just the kernel: each step synthesizes a fresh batch of
frames through a random channel ON THE DEVICE (datasets/synthetic_sc.py)
and runs the tx-constant fused chain on it.  Steps are serialized
device-side through the carried state scalar (each batch's generator key
folds in the previous batch's checksum), so the marginal-of-two-lengths
methodology applies unchanged — there is nothing the runtime can
deduplicate or reorder.

Usage: python scripts/bench_stream.py [batch] [n_batches]
Writes artifacts/stream_throughput.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu80211-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu80211.pipeline import stream


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    gen = sys.argv[3] if len(sys.argv) > 3 else "kernel"

    step, state0 = stream.make_device_stream_step(batch, gen=gen)
    # warmup (compile + readback path)
    summary, sample_h, state = step(0, state0)
    jax.block_until_ready(sample_h.re)
    float(next(iter(summary.values())))

    def run(k):
        t0 = time.perf_counter()
        st = state0
        last = None
        for i in range(k):
            summary, sample_h, st = step(i, st)
            last = summary
        # fence: read a value data-dependent on the whole chain of steps
        float(next(iter(last.values())))
        float(int(st))
        return time.perf_counter() - t0

    dt1 = run(n)
    dt2 = run(2 * n)
    dt = max(dt2 - dt1, 1e-9)
    out = {
        "metric": "device-resident streamed system (generate + fused chain "
                  "+ summaries) frames/s, serialized",
        "generator": gen,
        "frames_per_s": round(batch * n / dt, 1),
        "ms_per_batch": round(1e3 * dt / n, 4),
        "batch": batch,
        "n_batches": n,
        "wall_s_single_run": round(dt1, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    import os
    path = pathlib.Path(
        os.environ.get("TPU80211_ARTIFACTS_DIR")
        or pathlib.Path(__file__).resolve().parents[1] / "artifacts")
    path.mkdir(exist_ok=True)
    # non-default generators get their own artifact (a 'raw' run must
    # not clobber the kernel-generator system record)
    name = ("stream_throughput.json" if gen == "kernel"
            else f"stream_throughput_{gen}.json")
    (path / name).write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path / name)}))


if __name__ == "__main__":
    main()
