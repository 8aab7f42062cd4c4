#!/usr/bin/env python
"""Benchmark: MMSE-estimated + equalized frames/s on the attached device.

Runs the full split-complex RX chain (time-domain packets → block
extraction → all five estimators → MMSE-blended equalization,
tpu80211/pipeline/sc.py) over a large batch of synthetic frames and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "frames/s", "vs_baseline": N}

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
import numpy as np

from tpu80211.cplx import Cplx
from tpu80211.datasets import synthetic
from tpu80211 import constants as C
from tpu80211.pipeline import sc

# reference best: 20×1 frame-parallel MPI+OMP sweep row, 5.49e6 ticks/frame
# (main_mpi.c:1053-1055, CLOCKS_PER_SEC = 1e6)
BASELINE_FRAMES_PER_S = 1.0 / 5.49


def _build_inputs(batch: int):
    # host-side data prep: the synthetic generator uses complex fft/divide,
    # which the axon TPU runtime does not lower — run it on the CPU backend
    with jax.default_device(jax.devices("cpu")[0]):
        return _build_inputs_cpu(batch)


def _build_inputs_cpu(batch: int):
    key = jax.random.PRNGKey(42)
    fb = synthetic.generate(key, batch, snr_db=40.0, dtype=jnp.complex64)
    pkt_tx = np.asarray(synthetic.synthesize_time(fb.tx_symb))
    pkt_rx = np.asarray(synthetic.synthesize_time(fb.rx_symb))
    lts = np.asarray(
        synthetic.synthesize_time(
            jnp.broadcast_to(fb.tx_preamble_fft[:, None, :], fb.tx_symb.shape)
        )
    )[:, C.N_CP : C.N_CP + C.N_FFT]
    rlts = np.asarray(
        synthetic.synthesize_time(
            jnp.broadcast_to(fb.rx_preamble_fft[:, None, :], fb.tx_symb.shape)
        )
    )[:, C.N_CP : C.N_CP + C.N_FFT]
    rng = np.random.default_rng(0)
    noise = 1e-4 * (
        rng.standard_normal(rlts.shape) + 1j * rng.standard_normal(rlts.shape)
    )
    tx_lp = np.concatenate([lts[:, :32], lts, lts], axis=-1)
    rx_lp = np.concatenate([rlts[:, :32], rlts + noise, rlts], axis=-1)

    def c(x):
        return Cplx.from_complex(x, jnp.float32)

    return c(pkt_tx), c(pkt_rx), c(tx_lp), c(rx_lp)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    args = _build_inputs(batch)
    args = jax.device_put(args)
    fn = jax.jit(sc.rx_chain)

    # compile + warmup
    out = fn(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
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
