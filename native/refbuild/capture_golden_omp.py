#!/usr/bin/env python
"""Capture golden H_EST vectors from the reference's OPENMP estimators.

Runs ./refbin_omp — main_openmp.c:70-276 + utils.c's *_omp kernels
compiled UNMODIFIED with real -fopenmp (the no-op shim cannot execute
them: PS_Linear/Cubic/Sinc index subcarriers BY THREAD ID with 53-thread
teams, main_openmp.c:92-93/132/150-170, so a single-thread build writes
only H_EST[0]) — and stores every estimator's block-0 H_EST into
tests/golden/ref_h_est_omp.npz.

Determinism: verified bit-identical across three runs ON THIS HOST.
The 4 interpolators are disjoint-write deterministic by construction;
the MMSE path's determinant_impl_omp is knowingly racy (60 threads over
dependent elimination rows, utils.c:646-656) but its output is stably
all-NaN here — same terminal state as the sequential MMSE (Ryy = 2σ²I
+ unpivoted condensation, test_golden_ref.py).  On hosts where the race
resolves differently the finite prefix of the computation could differ,
but not the NaN outcome.

Usage: python capture_golden_omp.py   (~1 min)
"""

from __future__ import annotations

import pathlib
import subprocess

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
GOLDEN = HERE.parents[1] / "tests" / "golden"


def run_once() -> dict[str, np.ndarray]:
    out = subprocess.run(
        [str(HERE / "refbin_omp"), "0"], check=True, capture_output=True,
        text=True, timeout=1800,
    ).stdout
    ests: dict[str, list] = {}
    cur = None
    for line in out.splitlines():
        if line.startswith("EST "):
            cur = line.split()[1]
            ests[cur] = []
        elif cur is not None and line and line[0].isdigit():
            _, re_hex, im_hex = line.split()
            ests[cur].append(
                complex(float.fromhex(re_hex), float.fromhex(im_hex)))
    return {k: np.asarray(v, np.complex128) for k, v in ests.items()}


def main() -> None:
    runs = [run_once() for _ in range(3)]
    for k in runs[0]:
        for other in runs[1:]:
            same = np.array_equal(runs[0][k], other[k], equal_nan=True)
            assert same, f"nondeterministic OpenMP output: {k}"
    arrays = {f"{k}_omp": v for k, v in runs[0].items()}
    for k, v in arrays.items():
        print(k, v.shape, "finite" if np.isfinite(v).all() else "NaN")
    GOLDEN.mkdir(parents=True, exist_ok=True)
    path = GOLDEN / "ref_h_est_omp.npz"
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({sorted(arrays)})")


if __name__ == "__main__":
    main()
