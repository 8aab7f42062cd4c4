#!/usr/bin/env python
"""Benchmark: MMSE-estimated + equalized frames/s on the attached device.

Runs the full split-complex RX chain (time-domain packets → block
extraction → all five estimators → MMSE-blended equalization,
tpu80211/pipeline/sc.py) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

Methodology (honest wall-clock over a tunneled chip):
  * inputs are generated ON DEVICE by a jitted PRNG stage with a distinct
    key per iteration — no host↔device transfer in the timed loop, and no
    possibility of the runtime deduplicating identical dispatches;
  * each iteration returns only device-side scalar reductions of every
    output field, so all estimator work is live (nothing DCE-able) while
    result readback stays off the timed path;
  * `jax.block_until_ready` on the list of all iterations' outputs fences
    the measurement (the reference instead sums thread CPU ticks with
    `clock()`, main_mpi.c:1015-1081 — not comparable across thread counts).

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
import jax.numpy as jnp

from tpu80211 import constants as C
from tpu80211.cplx import Cplx
from tpu80211.pipeline import sc

# reference best: 20×1 frame-parallel MPI+OMP sweep row, 5.49e6 ticks/frame
# (main_mpi.c:1053-1055, CLOCKS_PER_SEC = 1e6)
BASELINE_FRAMES_PER_S = 1.0 / 5.49


def _gen_and_run(key, batch: int):
    """On-device: synthesize a random frame batch, run the full chain,
    reduce every output to a scalar."""
    ks = jax.random.split(key, 8)

    def cplx(k1, k2, shape):
        return Cplx(
            jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32),
        )

    tx_pkt = cplx(ks[0], ks[1], (batch, C.PACKET_SAMPLES))
    rx_pkt = cplx(ks[2], ks[3], (batch, C.PACKET_SAMPLES))
    tx_lp = cplx(ks[4], ks[5], (batch, C.PREAMBLE_SAMPLES))
    rx_lp = cplx(ks[6], ks[7], (batch, C.PREAMBLE_SAMPLES))
    out = sc.rx_chain(tx_pkt, rx_pkt, tx_lp, rx_lp)
    return jax.tree.map(jnp.sum, out)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    fn = jax.jit(_gen_and_run, static_argnames=("batch",))
    keys = jax.random.split(jax.random.PRNGKey(0), iters + 1)

    # compile + warmup
    jax.block_until_ready(fn(keys[-1], batch))

    t0 = time.perf_counter()
    outs = [fn(keys[i], batch) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    frames_per_s = batch * iters / dt
    result = {
        "metric": "full-RX-chain (5 estimators + MMSE-blended equalization) frames/s, single chip",
        "value": round(frames_per_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / BASELINE_FRAMES_PER_S, 1),
        "batch": batch,
        "iters": iters,
        "wall_s": round(dt, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
