#!/usr/bin/env python
"""Capture golden H_EST vectors from the reference's DISTRIBUTED code.

Runs ./refbin_mpi (the reference's main_mpi.c:168-1013 estimators +
utils.c:273 inverse_mpi compiled unmodified, executed under the loopback
MPI in ./mpiloop — see refdriver_mpi.cpp for the rank topology) and
stores every captured vector/matrix as complex128 in
tests/golden/ref_h_est_mpi.npz.

The run is bit-deterministic (verified: two runs diff-identical), takes
~5 minutes (two cofactor inverses in MMSE1, two sequential ones in
MMSE2), and needs no MPI installation.

Usage: python capture_golden_mpi.py
"""

from __future__ import annotations

import pathlib
import subprocess

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
GOLDEN = HERE.parents[1] / "tests" / "golden"


def main() -> None:
    out = subprocess.run(
        [str(HERE / "refbin_mpi")], check=True, capture_output=True,
        text=True, timeout=3600,
    ).stdout
    arrays: dict[str, np.ndarray] = {}
    cur: list[complex] | None = None
    mat: np.ndarray | None = None
    name = None
    for line in out.splitlines():
        if line.startswith("EST "):
            name = line.split()[1]
            cur = []
            mat = None
            arrays[name] = cur  # type: ignore[assignment]
        elif line.startswith("MAT "):
            _, name, rows, cols = line.split()
            mat = np.zeros((int(rows), int(cols)), np.complex128)
            arrays[name] = mat
            cur = None
        elif cur is not None and line and (line[0].isdigit() or line[0] == "-"):
            _, re_hex, im_hex = line.split()
            cur.append(complex(float.fromhex(re_hex), float.fromhex(im_hex)))
        elif mat is not None and line and line[0].isdigit():
            r, c, re_hex, im_hex = line.split()
            mat[int(r), int(c)] = complex(
                float.fromhex(re_hex), float.fromhex(im_hex))
    final = {k: np.asarray(v, np.complex128) for k, v in arrays.items()}
    for k, v in final.items():
        print(k, v.shape)
    GOLDEN.mkdir(parents=True, exist_ok=True)
    path = GOLDEN / "ref_h_est_mpi.npz"
    np.savez_compressed(path, **final)
    print(f"wrote {path} ({sorted(final)})")


if __name__ == "__main__":
    main()
