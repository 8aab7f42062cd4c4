"""Pallas kernel tests (interpret mode on the CPU backend).

The lane-batched Gauss solve must agree with jnp.linalg.solve and, through
the dense_pallas MMSE solver, with the Sherman-Morrison closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu80211 import constants as C
from tpu80211.cplx import Cplx
from tpu80211.kernels.mmse_solve import fused_rank1_solve, solve_batched_pallas


def _rand_u(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_fused_rank1_solve_matches_direct():
    rng = np.random.default_rng(0)
    b = 7  # deliberately not a multiple of LANES — exercises padding
    u = _rand_u(rng, (b, C.N_SC))
    rx = _rand_u(rng, (b, C.N_SC))
    ow2 = np.full((b,), 0.37)

    got = fused_rank1_solve(
        Cplx.from_complex(u), Cplx.from_complex(rx), jnp.asarray(ow2, jnp.float32)
    ).to_complex()

    for i in range(b):
        a = ow2[i] * np.eye(C.N_SC) + np.outer(u[i], np.conj(u[i]))
        want = np.linalg.solve(a, rx[i])
        rel = np.abs(got[i] - want).max() / np.abs(want).max()
        assert rel < 1e-4, (i, rel)


def test_fused_rank1_solve_cholesky():
    """method='chol' (lane-batched LLᴴ — the BASELINE-named solve) matches
    the direct solve and the Gauss path."""
    rng = np.random.default_rng(3)
    b = 7
    u = _rand_u(rng, (b, C.N_SC))
    rx = _rand_u(rng, (b, C.N_SC))
    ow2 = np.full((b,), 0.37)

    got = fused_rank1_solve(
        Cplx.from_complex(u), Cplx.from_complex(rx),
        jnp.asarray(ow2, jnp.float32), method="chol",
    ).to_complex()

    for i in range(b):
        a = ow2[i] * np.eye(C.N_SC) + np.outer(u[i], np.conj(u[i]))
        want = np.linalg.solve(a, rx[i])
        rel = np.abs(got[i] - want).max() / np.abs(want).max()
        assert rel < 1e-4, (i, rel)


def test_solve_batched_pallas_cholesky():
    rng = np.random.default_rng(4)
    b = 5
    u = _rand_u(rng, (b, C.N_SC))
    rx = _rand_u(rng, (b, C.N_SC, 1))
    a = 0.5 * np.eye(C.N_SC) + u[:, :, None] * np.conj(u[:, None, :])

    got = np.asarray(
        solve_batched_pallas(
            jnp.asarray(a, jnp.complex64), jnp.asarray(rx, jnp.complex64),
            method="chol",
        )
    )
    want = np.linalg.solve(a, rx)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_solve_batched_pallas_matches_xla():
    rng = np.random.default_rng(1)
    b = 5
    u = _rand_u(rng, (b, C.N_SC))
    rx = _rand_u(rng, (b, C.N_SC, 1))
    a = 0.5 * np.eye(C.N_SC) + u[:, :, None] * np.conj(u[:, None, :])

    got = np.asarray(
        solve_batched_pallas(jnp.asarray(a, jnp.complex64), jnp.asarray(rx, jnp.complex64))
    )
    want = np.linalg.solve(a, rx)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_dense_pallas_mmse_solver():
    """models.ps_mmse(solver='dense_pallas') == solver='sm' on the capture."""
    from tpu80211.datasets.loader import load_capture
    from tpu80211.models import lt_ls, ps_mmse

    cap = load_capture()
    h_lt = lt_ls(
        jnp.asarray(cap.tx_preamble_fft, jnp.complex64),
        jnp.asarray(cap.rx_preamble_fft, jnp.complex64),
    )
    args = (
        jnp.asarray(cap.tx_symb, jnp.complex64),
        jnp.asarray(cap.rx_symb, jnp.complex64),
        cap.ow2,
        h_lt,
    )
    a = np.asarray(ps_mmse(*args, solver="sm"))
    b = np.asarray(ps_mmse(*args, solver="dense_pallas"))
    # σ² ≈ 1e-7 makes the dense f32 solve ill-conditioned; the rank-1 sm
    # form is exact — compare at the f32-conditioning tolerance
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-2, rel


def test_sc_ps_mmse_dense_matches_sm(capture):
    """sc.ps_mmse_dense (fused Pallas) == sc.ps_mmse_sm on the capture at
    a relaxed σ²-conditioning tolerance."""
    from tpu80211.pipeline import sc

    txb = Cplx.from_complex(capture.tx_symb)
    rxb = Cplx.from_complex(capture.rx_symb)
    tx_pre = Cplx.from_complex(capture.tx_preamble_fft)
    rx_pre = Cplx.from_complex(capture.rx_preamble_fft)
    h_lt = sc.lt_ls(tx_pre, rx_pre)
    ow2 = jnp.asarray(capture.ow2, jnp.float32) * jnp.ones(())
    a = sc.ps_mmse_sm(txb, rxb, ow2, h_lt).to_complex()
    b = sc.ps_mmse_dense(txb, rxb, ow2, h_lt).to_complex()
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-2, rel
