#!/usr/bin/env python
"""MXU-layout experiment for the dense MMSE solve (VERDICT round-3 #1).

The production dense-solve kernel (kernels/mmse_solve.py) is lane-batched:
the batch lives in the 128-wide lane dimension, every factorization step
is a VPU op across 128 independent matrices, and the rank-K Schur update
cannot ride the MXU (both contraction operands are lane-dependent).  The
open north-star question is whether an **MXU-resident** layout — one
matrix per tile, complex embedded as a 2N×2N real symmetric matrix
([[Ar,−Ai],[Ai,Ar]], 128×128 f32 — exactly the MXU's native shape), with
the panel-blocked Cholesky's rank-K trailing update as a real
(R,K)@(K,R) `jnp.dot` — can beat the VPU kernel's ~4.2M solves/s.

This script measures that layout end-to-end and in isolation:

  * ``mxu`` — the full matrix-major solve: G matrices per grid step
    (independent chains for ILP), in-VMEM build of the real embedding
    from the rank-1 u vectors (same HBM contract as the production
    kernel: ~1 KB/matrix in), panel factorization + forward/backward
    substitution on the VPU, Schur updates on the MXU;
  * ``mxu_schur_only`` — the 13 per-matrix Schur dots alone (panel
    factorization replaced by a copy; WRONG math, timing probe): bounds
    what the MXU path could ever achieve if factorization were free.

Accuracy of the full variant is asserted against numpy before timing.

Result (TPU v5 lite, see PERF.md "Speed of light"): the matrix-major
layout loses by design, not by tuning — a single matrix's panel is K=8
lanes wide (6% VPU lane utilization vs 100% in the lane-batched layout)
and each Schur dot moves only ~230k MACs (≈14 MXU cycles) behind ~100+
cycles of fixed issue cost.  Recorded as the negative result the
north-star settlement requires.

Usage: python scripts/bench_mmse_mxu.py [batch] [iters] [G]
"""

from __future__ import annotations

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 64        # padded complex system size
N2 = 2 * N    # real embedding size — 128, the MXU's native dimension
KP = 8        # panel width (real columns)
NP = N2 // KP  # 16 panels (pad columns are unit-diagonal; factoring
               # through them is exact and keeps the loop uniform)


def _rows_mask(n, pred):
    return pred(jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0))


def _embed(ur, ui, ow2):
    """(N,1)+(N,1)+(1,1) → (2N,2N) real embedding of σ²I + u·uᴴ.

    M = [[Ar, −Ai], [Ai, Ar]] with Ar = σ²I + ur·urᵀ + ui·uiᵀ,
    Ai = ui·urᵀ − ur·uiᵀ; pad rows (53..63 per half) get unit diagonal.
    Symmetric PD whenever σ² > 0."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)).astype(jnp.float32)
    ar = ur * ur.T + ui * ui.T + ow2 * eye
    ai = ui * ur.T - ur * ui.T
    top = jnp.concatenate([ar, -ai], axis=1)
    bot = jnp.concatenate([ai, ar], axis=1)
    return jnp.concatenate([top, bot], axis=0)      # (128, 128)


def _chol_real_mxu(mw, lw, b, schur_only=False):
    """Blocked real Cholesky solve of one (2N,2N) SPD matrix.

    ``mw``/``lw``: (2N, 2N) VMEM scratch refs — the working matrix and
    the L factor, updated IN PLACE (a value-based SSA formulation kept
    ~16 live 64 kB matrices per chain and blew the 16 MB VMEM budget at
    G=8).  Panel factorization + interleaved forward substitution on the
    VPU; the rank-KP trailing update is jnp.dot((2N,KP),(KP,2N)) — the
    MXU op this experiment exists to measure.  ``schur_only`` replaces
    the column factorization with a copy (wrong math; isolates the dots).

    All blocks stay FULL-HEIGHT (2N rows): masks carry the panel offsets
    (Mosaic rejects concatenating slices whose sublane offsets differ, so
    the shrinking-row formulation of the lane-batched kernel does not
    port)."""
    for p in range(NP):
        jlo = p * KP
        pan = mw[:, jlo:jlo + KP]                   # (2N, KP) value
        if schur_only:
            lp = pan * 0.125                        # bogus, timing only
            for k in range(KP):
                j = jlo + k
                b = b - lp[:, k:k + 1] * b[j:j + 1] * 0.01
        else:
            cols = []
            for k in range(KP):
                j = jlo + k
                d = jax.lax.rsqrt(pan[j:j + 1, k:k + 1])     # (1,1)
                atb = _rows_mask(N2, lambda r: r >= j)
                col = jnp.where(atb, pan[:, k:k + 1] * d, 0.0)  # (2N,1)
                cols.append(col)
                # eliminate the remaining panel columns (rank-1, VPU);
                # the conjugate row is the transposed panel slice
                cmask = jax.lax.broadcasted_iota(jnp.int32, (1, KP), 1) > k
                row = jnp.where(
                    cmask, jnp.transpose(col[jlo:jlo + KP]), 0.0)
                pan = pan - col * row
                # forward-substitute b
                yj = b[j:j + 1] * d[0]
                strict = _rows_mask(N2, lambda r: r > j)
                b = b - jnp.where(strict, col, 0.0) * yj
                b = jnp.where(_rows_mask(N2, lambda r: r == j), yj, b)
            lp = jnp.concatenate(cols, axis=1)               # (2N, KP)
        lw[:, jlo:jlo + KP] = lp
        if p < NP - 1:
            # ---- the MXU op: rank-KP Schur update as one real dot ----
            # `below` zeroes rows < jlo+KP, so dot(below, belowᵀ) is the
            # exact (rows ≥ jlo+KP) × (cols ≥ jlo+KP) Schur term and a
            # no-op everywhere else — full (2N,KP)@(KP,2N) on the MXU.
            # precision=HIGHEST: the MXU multiplies bf16 natively; f32
            # operands need the multi-pass decomposition or the Schur
            # error (~2⁻⁸ · cond) swamps the solve — an inherent cost of
            # putting f32 factorization math on the MXU.
            below = jnp.where(_rows_mask(N2, lambda r: r >= jlo + KP),
                              lp, 0.0)
            mw[:, :] = mw[:, :] - jnp.dot(
                below, jnp.transpose(below),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    if schur_only:
        return b
    # backward solve Lᵀx = y, column reads from the L scratch
    x = b * 0.0
    for p in reversed(range(NP)):
        jlo = p * KP
        for k in reversed(range(KP)):
            j = jlo + k
            col = lw[:, jlo + k:jlo + k + 1]                 # (2N, 1)
            s = jnp.sum(col * x, axis=0, keepdims=True)
            xj = (b[j:j + 1] - s) / lw[j:j + 1, jlo + k]
            x = jnp.where(_rows_mask(N2, lambda r: r == j), xj, x)
    return x


def _kernel(ur_ref, ui_ref, br_ref, bi_ref, ow2_ref, x_ref, mw, lw, *, g,
            schur_only=False):
    for q in range(g):                 # g independent chains per step
        ur = ur_ref[q][:, None]        # (N, 1)
        ui = ui_ref[q][:, None]
        mw[q] = _embed(ur, ui, ow2_ref[q][0])
        b = jnp.concatenate([br_ref[q][:, None], bi_ref[q][:, None]], axis=0)
        x = _chol_real_mxu(mw.at[q], lw.at[q], b, schur_only=schur_only)
        x_ref[q] = x[:, 0]


@functools.partial(jax.jit, static_argnames=("g", "schur_only"))
def _call(ur, ui, br, bi, ow2, g, schur_only=False):
    batch = ur.shape[0]
    ntile = batch // g

    def spec(dim):
        return pl.BlockSpec((g, dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, g=g, schur_only=schur_only),
        grid=(ntile,),
        in_specs=[spec(N), spec(N), spec(N), spec(N), spec(1)],
        out_specs=spec(N2),
        out_shape=jax.ShapeDtypeStruct((batch, N2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((g, N2, N2), jnp.float32),
                        pltpu.VMEM((g, N2, N2), jnp.float32)],
    )(ur, ui, br, bi, ow2)


def solve_mxu(u, rx, ow2, g=8, schur_only=False):
    """Complex solve (σ²I + u·uᴴ)x = rx via the matrix-major MXU layout.
    u, rx: (B, 53) complex numpy; ow2 (B,). Returns (B, 53) complex."""
    b = u.shape[0]
    pad = ((0, 0), (0, N - u.shape[1]))
    ur = jnp.asarray(np.pad(u.real, pad), jnp.float32)
    ui = jnp.asarray(np.pad(u.imag, pad), jnp.float32)
    br = jnp.asarray(np.pad(rx.real, pad), jnp.float32)
    bi = jnp.asarray(np.pad(rx.imag, pad), jnp.float32)
    x = _call(ur, ui, br, bi, jnp.asarray(ow2, jnp.float32)[:, None],
              g=g, schur_only=schur_only)
    return np.asarray(x[:, :53]) + 1j * np.asarray(x[:, N:N + 53])


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    rng = np.random.default_rng(0)
    u = rng.standard_normal((batch, 53)) + 1j * rng.standard_normal((batch, 53))
    rx = rng.standard_normal((batch, 53)) + 1j * rng.standard_normal((batch, 53))
    ow2 = np.full((batch,), 0.37, np.float32)

    # accuracy first (small slice)
    got = solve_mxu(u[:g], rx[:g], ow2[:g], g=g)
    rel = 0.0
    for i in range(g):
        a = ow2[i] * np.eye(53) + np.outer(u[i], np.conj(u[i]))
        want = np.linalg.solve(a, rx[i])
        rel = max(rel, float(np.abs(got[i] - want).max() / np.abs(want).max()))
    print(json.dumps({"mxu_rel_err": rel}))
    assert rel < 5e-5, rel

    ur = jnp.asarray(np.pad(u.real, ((0, 0), (0, N - 53))), jnp.float32)
    ui = jnp.asarray(np.pad(u.imag, ((0, 0), (0, N - 53))), jnp.float32)
    br = jnp.asarray(np.pad(rx.real, ((0, 0), (0, N - 53))), jnp.float32)
    bi = jnp.asarray(np.pad(rx.imag, ((0, 0), (0, N - 53))), jnp.float32)
    ow2j = jnp.asarray(ow2, jnp.float32)[:, None]

    out = {"device": str(jax.devices()[0]), "batch": batch, "G": g,
           "mxu_rel_err": rel}
    for name, so in (("mxu", False), ("mxu_schur_only", True)):
        @jax.jit
        def step(s, inc, so=so):
            x = _call(ur * (1.0 + s + inc), ui, br, bi, ow2j,
                      g=g, schur_only=so)
            return jnp.tanh(jnp.sum(x)) * 1e-9

        incs = [jnp.float32(1e-6 * i) for i in range(2 * iters)]
        s = step(jnp.float32(0.0), incs[0])
        float(s)

        def run(n):
            t0 = time.perf_counter()
            sv = s
            for i in range(n):
                sv = step(sv, incs[i])
            float(sv)
            return time.perf_counter() - t0

        dt1 = run(iters)
        dt = max(run(2 * iters) - dt1, 1e-9)
        out[name] = {"solves_per_s": round(batch * iters / dt, 1),
                     "ms_per_step": round(1e3 * dt / iters, 4)}
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
