#!/usr/bin/env python
"""Capture golden H_EST vectors from the compiled REFERENCE binary.

Runs ./refbin (the reference's own main.c:66-212 estimator code, compiled
unmodified) for the requested OFDM blocks and stores every estimator's
H_EST as complex128 in tests/golden/ref_h_est.npz.  The binary prints
%La hex long-double floats, so the only precision loss is the final
long-double -> float64 cast here (relative error < 2^-52, far below the
parity tolerances).

Usage: python capture_golden.py [block ...]    (default: 0)
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
GOLDEN = HERE.parents[1] / "tests" / "golden"


def run_block(block: int) -> dict[str, np.ndarray]:
    out = subprocess.run(
        [str(HERE / "refbin"), str(block)],
        check=True, capture_output=True, text=True,
    ).stdout
    ests: dict[str, np.ndarray] = {}
    cur: list[complex] | None = None
    name = None
    for line in out.splitlines():
        if line.startswith("EST "):
            name = line.split()[1]
            cur = []
            ests[name] = cur  # type: ignore[assignment]
        elif cur is not None and line and line[0].isdigit():
            _, re_hex, im_hex = line.split()
            cur.append(complex(float.fromhex(re_hex), float.fromhex(im_hex)))
    return {k: np.asarray(v, np.complex128) for k, v in ests.items()}


def main() -> None:
    blocks = [int(b) for b in sys.argv[1:]] or [0]
    GOLDEN.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    # each block run costs ~4 min of cofactor-MMSE compute; blocks are
    # independent processes, so run them concurrently
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(max_workers=min(len(blocks), 15)) as ex:
        futs = {ex.submit(run_block, b): b for b in blocks}
        for fut in cf.as_completed(futs):
            b = futs[fut]
            print(f"reference binary finished block {b}")
            for name, vec in fut.result().items():
                assert vec.shape == (53,), (name, vec.shape)
                arrays[f"block{b}_{name}"] = vec
    path = GOLDEN / "ref_h_est.npz"
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({sorted(arrays)})")


if __name__ == "__main__":
    main()
