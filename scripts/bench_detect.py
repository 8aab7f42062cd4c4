#!/usr/bin/env python
"""Packet-detection throughput on the attached device.

Measures ops/detect.py (Schmidl&Cox metric + LTS matched filter + pair
disambiguation) over batches of raw sample streams with the serialized
data-dependent methodology of bench.py: each iteration's stream is
scaled by a factor derived from the previous iteration's detected
starts, and the fence reads the final sum of starts.

Usage: python scripts/bench_detect.py [batch] [stream_len] [iters]
Writes artifacts/detect_throughput.json.
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
import numpy as np

from tpu80211.cplx import Cplx
from tpu80211.datasets.loader import load_capture
from tpu80211.ops import detect


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    cap = load_capture()
    rng = np.random.default_rng(0)
    offs = rng.integers(50, n - 1400, batch)
    stream = (rng.standard_normal((batch, n))
              + 1j * rng.standard_normal((batch, n))) * 0.002
    frame = np.concatenate([cap.rx_lptot, cap.rx_packet])
    for i, o in enumerate(offs):
        stream[i, o:o + 1360] += frame
    x = Cplx.from_complex(stream, jnp.float32)
    ref = detect.lts_time_symbol(cap.tx_lptot)
    ref = Cplx(jnp.asarray(ref.re, jnp.float32), jnp.asarray(ref.im, jnp.float32))

    @jax.jit
    def step(x, s, inc):
        scale = 1.0 + s + inc
        xs = Cplx(x.re * scale, x.im * scale)
        res = detect.detect_packet(xs, ref)
        return jnp.tanh(jnp.sum(res["start"].astype(jnp.float32))) * 1e-9

    incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
    s = step(x, jnp.float32(0.0), incs[0])
    float(s)

    def run(k):
        t0 = time.perf_counter()
        sv = s
        for i in range(k):
            sv = step(x, sv, incs[i])
        float(sv)
        return time.perf_counter() - t0

    margins = sorted(max(run(2 * iters) - run(iters), 1e-9) for _ in range(3))
    dt = margins[1]
    # correctness alongside: the detected starts are within the timing
    # advance of the embedded offsets
    res = jax.jit(lambda x: detect.detect_packet(x, ref))(x)
    err = np.asarray(res["start"]) - offs
    assert np.asarray(res["detected"]).all()
    assert (err >= -4).all() and (err <= 4).all(), (err.min(), err.max())

    out = {
        "metric": "packet detection + timing sync, streams/s, serialized",
        "streams_per_s": round(batch * iters / dt, 1),
        "ms_per_batch": round(1e3 * dt / iters, 4),
        "samples_per_s": round(batch * n * iters / dt, 1),
        "batch": batch,
        "stream_len": n,
        "timing_err_range": [int(err.min()), int(err.max())],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    import os
    path = pathlib.Path(
        os.environ.get("TPU80211_ARTIFACTS_DIR")
        or pathlib.Path(__file__).resolve().parents[1] / "artifacts")
    path.mkdir(exist_ok=True)
    (path / "detect_throughput.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path / "detect_throughput.json")}))


if __name__ == "__main__":
    main()
