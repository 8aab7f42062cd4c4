"""Pallas TPU kernels for the dense MMSE solve path.

The reference's entire parallelization effort targets one operation: the
dense 53×53 complex inverse inside PS-MMSE (utils.c:141-170 — cofactor
expansion, 2.6e8 flops per call, distributed over MPI ranks in
inverse_mpi/inverse_mpi_omp, utils.c:273-437).  The TPU-native production
path removes the inverse entirely (rank-1 Sherman-Morrison,
models/ps_mmse.py); these kernels keep the reference's *computational
shape* — an explicit regularized 53×53 Hermitian solve per block — for the
benchmark config "PS-MMSE: Rhh build + regularized 53x53 complex solve"
(BASELINE.json configs[3]).

Design (tpu-first):
  * complex = split re/im f32 planes (the axon TPU runtime has no complex
    lowering; see tpu80211/cplx.py);
  * 53 pads to 64 rows/cols; the BATCH lives in the 128-wide lane
    dimension, so every scalar step of the textbook elimination becomes a
    128-lane VPU op across 128 independent matrices — the TPU analogue of
    the reference's thread-per-subcarrier OpenMP teams (main_openmp.c:72);
  * the fused kernel builds Ryy = σ²I + u·uᴴ *inside VMEM* from the
    length-64 vector u, so HBM traffic per matrix is ~1 KB (three vectors)
    instead of the 32 KB a materialized matrix would cost — the solve is
    compute-bound, not bandwidth-bound;
  * Gauss elimination without pivoting is exact-stable here: Ryy is
    Hermitian positive definite (σ² > 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu80211 import constants as C
from tpu80211.cplx import Cplx
from tpu80211.kernels import on_tpu

N = C.N_SC_PAD      # 64 — padded system size
LANES = 128         # matrices solved per grid step (one per VPU lane)



def _gauss_solve(ar, ai, br, bi):
    """In-register lane-batched complex Gauss solve (N systems per lane).

    Pallas TPU lowering has no dynamic_slice on values, so row/column/pivot
    extraction uses masked reductions (`where` + `sum` along a 64-long
    axis) — each costs one (N,N,LANES) VPU pass, the same order as the
    elimination update itself.  No pivoting: callers pass Hermitian PD
    systems (Ryy = σ²I + u·uᴴ, σ² > 0).
    """
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    def fwd(j, carry):
        ar, ai, br, bi = carry
        is_row = rows3 == j
        is_col = cols3 == j
        arow_r = jnp.sum(jnp.where(is_row, ar, 0.0), axis=0, keepdims=True)
        arow_i = jnp.sum(jnp.where(is_row, ai, 0.0), axis=0, keepdims=True)
        pr = jnp.sum(jnp.where(is_col, arow_r, 0.0), axis=1, keepdims=True)
        pi = jnp.sum(jnp.where(is_col, arow_i, 0.0), axis=1, keepdims=True)
        pd = pr * pr + pi * pi
        acol_r = jnp.sum(jnp.where(is_col, ar, 0.0), axis=1, keepdims=True)
        acol_i = jnp.sum(jnp.where(is_col, ai, 0.0), axis=1, keepdims=True)
        below = rows3 > j
        mr = jnp.where(below, (acol_r * pr + acol_i * pi) / pd, 0.0)
        mi = jnp.where(below, (acol_i * pr - acol_r * pi) / pd, 0.0)
        ar = ar - (mr * arow_r - mi * arow_i)
        ai = ai - (mr * arow_i + mi * arow_r)
        is_row2 = rows2 == j
        brow_r = jnp.sum(jnp.where(is_row2, br, 0.0), axis=0, keepdims=True)
        brow_i = jnp.sum(jnp.where(is_row2, bi, 0.0), axis=0, keepdims=True)
        br = br - (mr[:, 0, :] * brow_r - mi[:, 0, :] * brow_i)
        bi = bi - (mr[:, 0, :] * brow_i + mi[:, 0, :] * brow_r)
        return ar, ai, br, bi

    ar, ai, br, bi = jax.lax.fori_loop(0, N, fwd, (ar, ai, br, bi))

    def bwd(jj, carry):
        br, bi, xr, xi = carry
        j = N - 1 - jj
        is_row = rows3 == j
        is_col = cols3 == j
        diag_mask = jnp.logical_and(is_row, is_col)
        pr = jnp.sum(jnp.where(diag_mask, ar, 0.0), axis=(0, 1))
        pi = jnp.sum(jnp.where(diag_mask, ai, 0.0), axis=(0, 1))
        pd = pr * pr + pi * pi
        is_row2 = rows2 == j
        brow_r = jnp.sum(jnp.where(is_row2, br, 0.0), axis=0)
        brow_i = jnp.sum(jnp.where(is_row2, bi, 0.0), axis=0)
        xjr = (brow_r * pr + brow_i * pi) / pd
        xji = (brow_i * pr - brow_r * pi) / pd
        xr = jnp.where(is_row2, xjr[None, :], xr)
        xi = jnp.where(is_row2, xji[None, :], xi)
        acol_r = jnp.sum(jnp.where(is_col, ar, 0.0), axis=1)
        acol_i = jnp.sum(jnp.where(is_col, ai, 0.0), axis=1)
        above = rows2 < j
        cr = jnp.where(above, acol_r, 0.0)
        ci = jnp.where(above, acol_i, 0.0)
        br = br - (cr * xjr[None, :] - ci * xji[None, :])
        bi = bi - (cr * xji[None, :] + ci * xjr[None, :])
        return br, bi, xr, xi

    xr = jnp.zeros((N, LANES), jnp.float32)
    xi = jnp.zeros((N, LANES), jnp.float32)
    br, bi, xr, xi = jax.lax.fori_loop(0, N, bwd, (br, bi, xr, xi))
    return ar, ai, br, bi, xr, xi


def _chol_solve(ar, ai, br, bi):
    """Lane-batched complex Cholesky (LLᴴ) solve — the factorization the
    BASELINE north star names for the 53×53 MMSE system.  Same masked-
    reduction style as `_gauss_solve`; valid for Hermitian PD inputs only
    (Ryy = σ²I + u·uᴴ, σ² > 0).  ~25% fewer (N,N,LANES) VPU passes than
    Gauss: the Hermitian row is read off as the conjugate of the column,
    so each factorization step needs one extraction + one rank-1 update.
    """
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)

    def fact(j, carry):
        ar, ai = carry
        is_col = cols3 == j
        # column j of the (updated) matrix: (N, 1, LANES)
        colr = jnp.sum(jnp.where(is_col, ar, 0.0), axis=1, keepdims=True)
        coli = jnp.sum(jnp.where(is_col, ai, 0.0), axis=1, keepdims=True)
        # d² = A[j,j] (real, > 0); L[:,j] = A[:,j]/d
        djj = jnp.sum(jnp.where(rows3 == j, colr, 0.0), axis=0, keepdims=True)
        dinv = jax.lax.rsqrt(djj)
        lr = colr * dinv
        li = coli * dinv
        # Hermitian: conj(L[k,j]) along the column axis = (lrᵀ, -liᵀ);
        # the transpose touches only sublane dims (lane axis unchanged)
        urow_r = jnp.transpose(lr, (1, 0, 2))
        urow_i = -jnp.transpose(li, (1, 0, 2))
        # trailing update A[i,k] -= L[i,j]·conj(L[k,j]) for i,k > j
        trail = jnp.logical_and(rows3 > j, cols3 > j)
        upd_r = jnp.where(trail, lr * urow_r - li * urow_i, 0.0)
        upd_i = jnp.where(trail, lr * urow_i + li * urow_r, 0.0)
        ar = ar - upd_r
        ai = ai - upd_i
        # write L's column j back in place (rows < j zeroed — upper unused)
        lower = rows3 >= j
        ar = jnp.where(is_col, jnp.where(lower, lr, 0.0), ar)
        ai = jnp.where(is_col, jnp.where(lower, li, 0.0), ai)
        return ar, ai

    ar, ai = jax.lax.fori_loop(0, N, fact, (ar, ai))

    # forward solve L y = b (y overwrites b row by row)
    def fwd(j, carry):
        br, bi = carry
        is_col = cols3 == j
        lcol_r = jnp.sum(jnp.where(is_col, ar, 0.0), axis=1)  # (N, LANES)
        lcol_i = jnp.sum(jnp.where(is_col, ai, 0.0), axis=1)
        is_row2 = rows2 == j
        d = jnp.sum(jnp.where(is_row2, lcol_r, 0.0), axis=0, keepdims=True)
        bjr = jnp.sum(jnp.where(is_row2, br, 0.0), axis=0, keepdims=True) / d
        bji = jnp.sum(jnp.where(is_row2, bi, 0.0), axis=0, keepdims=True) / d
        below = rows2 > j
        cr = jnp.where(below, lcol_r, 0.0)
        ci = jnp.where(below, lcol_i, 0.0)
        br = br - (cr * bjr - ci * bji)
        bi = bi - (cr * bji + ci * bjr)
        br = jnp.where(is_row2, bjr, br)
        bi = jnp.where(is_row2, bji, bi)
        return br, bi

    br, bi = jax.lax.fori_loop(0, N, fwd, (br, bi))

    # backward solve Lᴴ x = y:  x_j = (y_j − Σ_{i>j} conj(L[i,j])·x_i)/d
    def bwd(jj, carry):
        xr, xi = carry
        j = N - 1 - jj
        is_col = cols3 == j
        lcol_r = jnp.sum(jnp.where(is_col, ar, 0.0), axis=1)
        lcol_i = jnp.sum(jnp.where(is_col, ai, 0.0), axis=1)
        is_row2 = rows2 == j
        d = jnp.sum(jnp.where(is_row2, lcol_r, 0.0), axis=0, keepdims=True)
        below = rows2 > j
        cr = jnp.where(below, lcol_r, 0.0)
        ci = jnp.where(below, lcol_i, 0.0)
        # Σ conj(L[i,j])·x_i over i>j
        sr = jnp.sum(cr * xr + ci * xi, axis=0, keepdims=True)
        si = jnp.sum(cr * xi - ci * xr, axis=0, keepdims=True)
        yjr = jnp.sum(jnp.where(is_row2, xr, 0.0), axis=0, keepdims=True)
        yji = jnp.sum(jnp.where(is_row2, xi, 0.0), axis=0, keepdims=True)
        xjr = (yjr - sr) / d
        xji = (yji - si) / d
        xr = jnp.where(is_row2, xjr, xr)
        xi = jnp.where(is_row2, xji, xi)
        return xr, xi

    xr, xi = jax.lax.fori_loop(0, N, bwd, (br, bi))
    return xr, xi


def _fused_kernel(ur, ui, rr, ri, ow2_ref, zr, zi, *, method="gauss"):
    """One grid step: build σ²I + u·uᴴ and solve for `LANES` systems.

    Refs: ur/ui/rr/ri (N, LANES) in VMEM; ow2_ref (1, LANES); out zr/zi.
    Lane l carries an independent system.  ``method``: "gauss" (default,
    no-pivot elimination) or "chol" (LLᴴ — BASELINE.json's named solve).
    """
    u_re = ur[:]
    u_im = ui[:]
    ow2 = ow2_ref[0, :]  # (LANES,)

    # Ryy[i,k,l] = σ²δ_ik + u[i,l]·conj(u[k,l])
    eye = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0) == (
        jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
    )
    ar = (
        u_re[:, None, :] * u_re[None, :, :]
        + u_im[:, None, :] * u_im[None, :, :]
        + jnp.where(eye, ow2[None, None, :], 0.0)
    )
    ai = u_im[:, None, :] * u_re[None, :, :] - u_re[:, None, :] * u_im[None, :, :]
    br = rr[:]
    bi = ri[:]

    if method == "chol":
        xr, xi = _chol_solve(ar, ai, br, bi)
    else:
        ar, ai, br, bi, xr, xi = _gauss_solve(ar, ai, br, bi)
    zr[:] = xr
    zi[:] = xi


@functools.partial(jax.jit, static_argnames=("interpret", "method"))
def _fused_call(ur, ui, rr, ri, ow2, interpret, method="gauss"):
    ntile = ur.shape[-1] // LANES
    spec_v = pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_kernel, method=method),
        grid=(ntile,),
        in_specs=[spec_v, spec_v, spec_v, spec_v, spec_s],
        out_specs=[spec_v, spec_v],
        out_shape=[
            jax.ShapeDtypeStruct(ur.shape, jnp.float32),
            jax.ShapeDtypeStruct(ur.shape, jnp.float32),
        ],
        interpret=interpret,
    )(ur, ui, rr, ri, ow2)


def fused_rank1_solve(u: Cplx, rx: Cplx, ow2, method: str = "gauss") -> Cplx:
    """z = (σ²I + u·uᴴ)⁻¹ rx for a batch of systems, via the fused kernel.

    u, rx: Cplx (..., 53);  ow2: real, broadcastable to (...,).
    ``method``: "gauss" | "chol" (lane-batched LLᴴ).  Returns Cplx (..., 53).
    """
    *lead, nsc = u.shape
    assert nsc == C.N_SC, u.shape
    b = int(np.prod(lead)) if lead else 1
    bpad = -(-b // LANES) * LANES

    def prep(plane):  # (..., 53) -> (64, bpad) lane-major
        flat = plane.reshape(b, nsc)
        flat = jnp.pad(flat, ((0, bpad - b), (0, N - nsc)))
        return flat.T  # (64, bpad)

    ow2_flat = jnp.broadcast_to(jnp.asarray(ow2, jnp.float32), tuple(lead)).reshape(b)
    ow2_row = jnp.pad(ow2_flat, (0, bpad - b), constant_values=1.0)[None, :]

    zr, zi = _fused_call(
        prep(u.re), prep(u.im), prep(rx.re), prep(rx.im), ow2_row,
        interpret=not on_tpu(), method=method,
    )
    out_re = zr.T[:b, :nsc].reshape(*lead, nsc)
    out_im = zi.T[:b, :nsc].reshape(*lead, nsc)
    return Cplx(out_re, out_im)


def solve_batched_pallas(a: jnp.ndarray, rhs: jnp.ndarray,
                         method: str = "gauss") -> jnp.ndarray:
    """Drop-in for jnp.linalg.solve on (..., 53, 53) complex Hermitian-PD
    systems with (..., 53, 1) rhs — complex-dtype wrapper over the
    lane-batched Gauss kernel (models/ps_mmse.py solver="dense_pallas").

    Only used on CPU (interpret mode) or with split-complex marshalling;
    the production TPU path uses fused_rank1_solve which never builds `a`.
    """
    *lead, n, n2 = a.shape
    assert n == n2 == C.N_SC, a.shape
    b = int(np.prod(lead)) if lead else 1
    bpad = -(-b // LANES) * LANES

    af = a.reshape(b, n, n)
    rf = rhs.reshape(b, n)
    af = jnp.pad(af, ((0, bpad - b), (0, N - n), (0, N - n)))
    # unit diagonal on the pad rows keeps the padded system nonsingular
    eye_pad = jnp.concatenate(
        [jnp.zeros((n,)), jnp.ones((N - n,))]
    )
    af = af + jnp.eye(N) * eye_pad
    rf = jnp.pad(rf, ((0, bpad - b), (0, N - n)))

    ar = jnp.transpose(jnp.real(af), (1, 2, 0)).astype(jnp.float32)
    ai = jnp.transpose(jnp.imag(af), (1, 2, 0)).astype(jnp.float32)
    rr = jnp.transpose(jnp.real(rf), (1, 0)).astype(jnp.float32)
    ri = jnp.transpose(jnp.imag(rf), (1, 0)).astype(jnp.float32)

    zr, zi = _dense_call(ar, ai, rr, ri, interpret=not on_tpu(), method=method)
    z = (zr.T[:b, :n] + 1j * zi.T[:b, :n]).astype(a.dtype)
    return z.reshape(*lead, n, 1)


def _dense_kernel(ar_ref, ai_ref, rr, ri, zr, zi, *, method="gauss"):
    """Generic (materialized-matrix) variant of _fused_kernel."""
    if method == "chol":
        xr, xi = _chol_solve(ar_ref[:], ai_ref[:], rr[:], ri[:])
    else:
        _, _, _, _, xr, xi = _gauss_solve(ar_ref[:], ai_ref[:], rr[:], ri[:])
    zr[:] = xr
    zi[:] = xi


@functools.partial(jax.jit, static_argnames=("interpret", "method"))
def _dense_call(ar, ai, rr, ri, interpret, method="gauss"):
    ntile = ar.shape[-1] // LANES
    spec_m = pl.BlockSpec((N, N, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dense_kernel, method=method),
        grid=(ntile,),
        in_specs=[spec_m, spec_m, spec_v, spec_v],
        out_specs=[spec_v, spec_v],
        out_shape=[
            jax.ShapeDtypeStruct(rr.shape, jnp.float32),
            jax.ShapeDtypeStruct(rr.shape, jnp.float32),
        ],
        interpret=interpret,
    )(ar, ai, rr, ri)
