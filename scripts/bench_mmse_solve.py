#!/usr/bin/env python
"""On-chip validation + benchmark of the dense MMSE solve kernels.

Runs on the real TPU (the default axon backend):
  1. correctness — the panel-blocked Pallas kernels (gauss | chol) against
     the loop-based reference solvers evaluated on CPU;
  2. throughput — solves/s for both methods with the serialized
     data-dependent loop + device→host readback fence + marginal-time
     methodology (see bench.py's docstring for why block_until_ready is
     not a fence on this runtime).

This is the benchmark for BASELINE.json configs[3] ("PS-MMSE: Rhh build +
regularized 53x53 complex solve") — the operation the reference
distributes over MPI ranks (utils.c:273-353, main_mpi.c:636-742).

Usage: python scripts/bench_mmse_solve.py [batch] [iters]
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
from tpu80211.kernels.mmse_solve import LANES, fused_rank1_solve


def _correctness(method: str) -> float:
    rng = np.random.default_rng(0)
    b = LANES
    u = rng.standard_normal((b, 53)) + 1j * rng.standard_normal((b, 53))
    rx = rng.standard_normal((b, 53)) + 1j * rng.standard_normal((b, 53))
    ow2 = np.full((b,), 0.37, np.float32)
    got = np.asarray(
        fused_rank1_solve(
            Cplx.from_complex(u), Cplx.from_complex(rx), jnp.asarray(ow2),
            method=method,
        ).to_complex()
    )
    rel = 0.0
    for i in range(0, b, 17):
        a = ow2[i] * np.eye(53) + np.outer(u[i], np.conj(u[i]))
        want = np.linalg.solve(a, rx[i])
        rel = max(rel, float(np.abs(got[i] - want).max() / np.abs(want).max()))
    return rel


def _throughput(method: str, batch: int, iters: int,
                pipelined: bool = False) -> dict:
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    u = Cplx(jax.random.normal(ks[0], (batch, 53), jnp.float32),
             jax.random.normal(ks[1], (batch, 53), jnp.float32))
    rx = Cplx(jax.random.normal(ks[2], (batch, 53), jnp.float32),
              jax.random.normal(ks[3], (batch, 53), jnp.float32))
    ow2 = jnp.full((batch,), 0.37, jnp.float32)

    if method == "xla":
        # XLA's own batched complex solve (jnp.linalg.solve → LU) on the
        # materialized (B, 53, 53) systems — the natural non-Pallas
        # implementation, for an honest Pallas-vs-XLA comparison row.
        @jax.jit
        def step(u, rx, ow2, s, inc):
            eps = s + inc
            uc = (u.re * (1.0 + eps) + 1j * u.im).astype(jnp.complex64)
            rc = (rx.re + 1j * rx.im).astype(jnp.complex64)
            a = ow2[:, None, None] * jnp.eye(53, dtype=jnp.complex64) + (
                uc[:, :, None] * jnp.conj(uc[:, None, :])
            )
            z = jnp.linalg.solve(a, rc[..., None])[..., 0]
            return jnp.tanh(jnp.sum(z.real) + jnp.sum(z.imag)) * 1e-9
    elif method == "xla_chol":
        # XLA batched Cholesky + triangular solves (the Hermitian-PD path)
        @jax.jit
        def step(u, rx, ow2, s, inc):
            eps = s + inc
            uc = (u.re * (1.0 + eps) + 1j * u.im).astype(jnp.complex64)
            rc = (rx.re + 1j * rx.im).astype(jnp.complex64)
            a = ow2[:, None, None] * jnp.eye(53, dtype=jnp.complex64) + (
                uc[:, :, None] * jnp.conj(uc[:, None, :])
            )
            l = jnp.linalg.cholesky(a)
            y = jax.lax.linalg.triangular_solve(
                l, rc[..., None], left_side=True, lower=True)
            z = jax.lax.linalg.triangular_solve(
                l, y, left_side=True, lower=True, conjugate_a=True,
                transpose_a=True)[..., 0]
            return jnp.tanh(jnp.sum(z.real) + jnp.sum(z.imag)) * 1e-9
    else:
        @jax.jit
        def step(u, rx, ow2, s, inc):
            eps = s + inc
            u = Cplx(u.re * (1.0 + eps), u.im)
            z = fused_rank1_solve(u, rx, ow2, method=method)
            return jnp.tanh(jnp.sum(z.re) + jnp.sum(z.im)) * 1e-9

    incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
    s = step(u, rx, ow2, jnp.float32(0.0), incs[0])
    float(s)

    if pipelined:
        # round-1 comparability mode: independent dispatches may overlap
        # on device; the fence reads a sum over every step's output.
        # Optimistic for a dependent workload — the serialized number
        # below is the honest one (see bench.py's methodology docstring).
        def run(n):
            t0 = time.perf_counter()
            outs = [step(u, rx, ow2, jnp.float32(0.0), incs[i])
                    for i in range(n)]
            total = outs[0]
            for o in outs[1:]:
                total = total + o
            float(total)
            return time.perf_counter() - t0
    else:
        def run(n):
            t0 = time.perf_counter()
            sv = s
            for i in range(n):
                sv = step(u, rx, ow2, sv, incs[i])
            float(sv)  # readback fence
            return time.perf_counter() - t0

    dt1 = run(iters)
    dt2 = run(2 * iters)
    dt = max(dt2 - dt1, 1e-9)
    return {
        "method": method + ("+pipelined" if pipelined else ""),
        "solves_per_s": round(batch * iters / dt, 1),
        "ms_per_step": round(1e3 * dt / iters, 4),
        "batch": batch,
        "wall_s_single_loop": round(dt1, 4),
    }


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = {"device": str(jax.devices()[0])}
    import os
    methods = os.environ.get("METHODS", "gauss,chol").split(",")
    for method in methods:
        pipelined = method.endswith("+pipelined")
        base = method.removesuffix("+pipelined")
        if base in ("gauss", "chol", "gauss_looped", "chol_looped") and not pipelined:
            rel = _correctness(base)
            out[f"{base}_rel_err"] = rel
            assert rel < 5e-5, (base, rel)
        out[method] = _throughput(base, batch, iters, pipelined=pipelined)
        print(json.dumps(out[method]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
