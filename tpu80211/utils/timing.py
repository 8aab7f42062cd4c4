"""Timing / profiling harness — the structured replacement for the
reference's observability story.

The reference brackets estimator calls with `clock()` and hand-pastes the
tick counts into a source comment (main.c:40-45, main_mpi.c:98-104, the
results table at main_mpi.c:1015-1081), with printf progress lines as
tracing (utils.c:314).  Here:

  * `timeit` — wall-clock timing with `jax.block_until_ready` fences
    (dispatch-ordering replaces MPI_Barrier; wall-clock replaces the
    thread-summed CPU ticks that make the reference's OpenMP numbers
    incomparable, SURVEY.md §6);
  * `Report` — structured JSON accumulation (frames/s, per-stage ms,
    scaling efficiency) instead of comment blocks;
  * `roofline` — back-of-envelope FLOP/byte accounting for a pipeline
    stage vs. chip peaks, for speed-of-light checks;
  * `trace` — context manager around `jax.profiler` for xprof dumps.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Any, Callable

import jax


def _readback_fence(out) -> None:
    """Force completion by fetching one element to the host.

    `block_until_ready` is not a completion fence on the tunneled axon
    runtime (it acknowledges dispatch; see PERF.md) — a device→host read
    of a value that depends on the output is.
    """
    import numpy as np

    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[0])


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kw) -> float:
    """Mean wall-clock seconds per call, fenced with a device→host
    readback (see _readback_fence).  Note: identical args every iteration
    can still be absorbed by runtime-level caching on some backends — for
    chip-grade numbers use bench.py's serialized-dependency methodology.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kw)
    _readback_fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    _readback_fence(out)
    return (time.perf_counter() - t0) / iters


@dataclasses.dataclass
class Report:
    """Accumulates named measurements; serializes to one JSON object."""

    meta: dict = dataclasses.field(default_factory=dict)
    entries: dict = dataclasses.field(default_factory=dict)

    def add(self, name: str, **fields: Any) -> None:
        self.entries[name] = fields

    def json(self) -> str:
        return json.dumps({"meta": self.meta, **self.entries})

    def save(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.json() + "\n")


# Rough per-chip peaks for roofline estimates (public figures).
CHIP_PEAKS = {
    # name: (f32 matmul TFLOP/s, HBM GB/s)
    "v5e": (98.0, 819.0),
    "v5p": (229.0, 2765.0),
    "cpu": (0.1, 50.0),
}


def roofline(flops: float, bytes_moved: float, chip: str = "v5e") -> dict:
    """Attainable time bounds for a stage moving `bytes_moved` HBM bytes
    and doing `flops` MXU/VPU flops."""
    peak_f, peak_b = CHIP_PEAKS.get(chip, CHIP_PEAKS["v5e"])
    t_compute = flops / (peak_f * 1e12)
    t_memory = bytes_moved / (peak_b * 1e9)
    return {
        "flops": flops,
        "bytes": bytes_moved,
        "intensity_flop_per_byte": flops / max(bytes_moved, 1.0),
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "bound": "compute" if t_compute > t_memory else "memory",
        "t_light_s": max(t_compute, t_memory),
    }


def rx_chain_cost(batch: int) -> dict:
    """FLOP/byte model of the split-complex full RX chain per invocation.

    Dominant terms: block-extraction DFT matmuls (2 packets ×
    (B·15,64)@(64,53) × 4 real matmuls) and the elementwise estimator /
    equalizer work; see pipeline/sc.py.
    """
    from tpu80211 import constants as C

    b = batch
    dft = 2 * b * C.N_BLOCKS * C.N_FFT * C.N_SC * 2 * 4  # 2 pkts, 4 real mm
    mmse_dft = 2 * b * C.N_SC * C.N_SC * 2 * 4
    elementwise = 40 * b * C.N_BLOCKS * C.N_SC  # LS/SM/equalize, ~40 flop/elt
    flops = dft + mmse_dft + elementwise
    bytes_in = b * (2 * C.PACKET_SAMPLES + 2 * C.PREAMBLE_SAMPLES) * 2 * 4
    bytes_out = b * (C.N_BLOCKS * C.N_SC + 6 * C.N_SC) * 2 * 4
    return {"flops": flops, "bytes": bytes_in + bytes_out}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpu80211-trace"):
    """jax.profiler trace scope (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
