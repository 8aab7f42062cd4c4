#!/usr/bin/env python
"""Serving latency/throughput tradeoff of the fused RX chain.

Sweeps batch size and reports, for each, the serialized per-step latency
and the implied frames/s of the fused whole-chain Pallas kernel
(kernels/fused_chain.py) — the table a serving deployment needs to pick
its batching window.  Same methodology as bench.py: data-dependent
serialized loop, device→host readback fence, loop-length marginal.

The reference has no serving story at all (single-shot binaries,
main.c:10-64); this is a capability of the new framework.

Usage: python scripts/bench_latency.py [iters] [b1,b2,...] [--f32]
Writes artifacts/latency_sweep.json and prints one JSON line per batch.
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

import jax.numpy as jnp

import bench


REPEATS = 3


def sweep_one(batch: int, iters: int, dtype) -> dict:
    base = jax.jit(bench._gen, static_argnames=("batch", "dtype"))(
        jax.random.PRNGKey(0), batch, dtype
    )
    jax.block_until_ready(base)
    base = jax.tree.map(lambda x: x.T, base)  # lane-major for the kernel

    fn = jax.jit(bench._step_fused)
    incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
    s = fn(base, jnp.float32(0.0), incs[0])
    float(s)

    def run(n):
        t0 = time.perf_counter()
        sv = s
        for i in range(n):
            sv = fn(base, sv, incs[i])
        float(sv)
        return time.perf_counter() - t0

    # repeat the whole marginal measurement: the tunnel dispatch jitter is
    # of order the device step itself at small batches, so a single
    # (dt2 - dt1) difference can be pure noise (ADVICE round-2: the
    # published 4096-row varied 0.03-0.22 ms across runs)
    singles, margins = [], []
    for _ in range(REPEATS):
        dt1 = run(iters)
        margins.append(max(run(2 * iters) - dt1, 1e-9))
        singles.append(dt1)
    margins.sort()
    dt = margins[REPEATS // 2]  # median
    spread = margins[-1] - margins[0]
    dt1 = sorted(singles)[REPEATS // 2]
    row = {
        "batch": batch,
        "ms_per_step_marginal": round(1e3 * dt / iters, 4),
        "ms_per_step_marginal_spread": round(1e3 * spread / iters, 4),
        "repeats": REPEATS,
        # single-loop number INCLUDES the fixed dispatch/tunnel overhead —
        # for small batches that overhead IS the serving latency floor, so
        # both are reported rather than only the marginal.
        "ms_per_step_single_loop": round(1e3 * dt1 / iters, 4),
        "frames_per_s": round(batch * iters / dt, 1),
    }
    if dt / iters < 50e-6 or spread > 0.5 * dt:
        # the marginal is below dispatch jitter, or the repeats disagree
        # by more than half the median: the device step is not resolvable
        # at this batch — publish null rather than noise-as-signal
        # (cf. PERF.md "Measurement over the tunnel")
        row["frames_per_s"] = None
        row["unresolved"] = True
    return row


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = int(argv[0]) if argv else 32
    dtype = jnp.float32 if "--f32" in sys.argv[1:] else jnp.bfloat16
    # each UNSEEN batch shape pays a multi-minute Mosaic compile through
    # the tunnel (cached persistently thereafter) — keep the sweep short
    batches = tuple(int(b) for b in
                    (argv[1].split(",") if len(argv) > 1
                     else ("512", "4096", "32768")))
    rows = []
    for batch in batches:
        row = sweep_one(batch, iters, dtype)
        print(json.dumps(row))
        rows.append(row)
    out = {
        "device": str(jax.devices()[0]),
        "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
        "iters": iters,
        "rows": rows,
    }
    import os
    path = pathlib.Path(
        os.environ.get("TPU80211_ARTIFACTS_DIR")
        or pathlib.Path(__file__).resolve().parents[1] / "artifacts")
    path.mkdir(exist_ok=True)
    (path / "latency_sweep.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path / "latency_sweep.json")}))


if __name__ == "__main__":
    main()
