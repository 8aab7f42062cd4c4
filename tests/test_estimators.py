"""Estimator parity: batched JAX paths vs the 80-bit scalar-loop oracle.

The framework computes every estimator as batched matmuls/closed forms; the
oracle (parity/oracle_np.py) re-implements the reference's per-subcarrier
loops at clongdouble.  Agreement at f64 to ~1e-10 and at f32 to the SNR-40dB
noise floor validates both the algebra (e.g. Sherman-Morrison == explicit
53×53 inverse) and the quirk emulation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu80211 import constants as C
from tpu80211.config import EstimatorMode
from tpu80211.models import lt_ls, ps_interp, ps_mmse
from tpu80211.parity import oracle_np as oracle

MODES = [EstimatorMode.MATH, EstimatorMode.MATLAB, EstimatorMode.C_PARITY]
KINDS = ["linear", "cubic", "sinc", "spline"]

F64_TOL = 1e-10
F32_TOL = 2e-4  # relative; f32 has ~1e-7 eps, capture magnitudes O(1)


def _rel_err(got, want):
    got, want = np.asarray(got, np.complex128), np.asarray(want, np.complex128)
    scale = max(np.abs(want).max(), 1e-30)
    return np.abs(got - want).max() / scale


@pytest.mark.parametrize("mode", MODES)
def test_lt_ls(capture, mode):
    want = oracle.lt_ls_oracle(capture.tx_preamble_fft, capture.rx_preamble_fft, mode)
    got = lt_ls(
        jnp.asarray(capture.tx_preamble_fft),
        jnp.asarray(capture.rx_preamble_fft),
        mode=mode,
    )
    assert _rel_err(got, want) < F64_TOL
    got32 = lt_ls(
        jnp.asarray(capture.tx_preamble_fft, jnp.complex64),
        jnp.asarray(capture.rx_preamble_fft, jnp.complex64),
        mode=mode,
    )
    assert _rel_err(got32, want) < F32_TOL


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("kind", KINDS)
def test_ps_interp(capture, kind, mode):
    want = oracle.ps_interp_oracle(capture.tx_symb, capture.rx_symb, kind, mode)
    got = ps_interp(
        jnp.asarray(capture.tx_symb), jnp.asarray(capture.rx_symb), kind, mode=mode
    )
    assert _rel_err(got, want) < F64_TOL
    got32 = ps_interp(
        jnp.asarray(capture.tx_symb, jnp.complex64),
        jnp.asarray(capture.rx_symb, jnp.complex64),
        kind,
        mode=mode,
    )
    assert _rel_err(got32, want) < F32_TOL


def test_interp_exact_at_pilots(capture):
    """All four interpolators reproduce the pilot ratios exactly at pilot
    subcarriers (for sinc because the pilot spacing is uniform: the offsets
    are integer multiples of 14 and sinc(±1,±2,±3)=0)."""
    tx = jnp.asarray(capture.tx_symb[:1])
    rx = jnp.asarray(capture.rx_symb[:1])
    hp = np.asarray(rx[0, list(C.PILOT_IDX)] / tx[0, list(C.PILOT_IDX)])
    for kind in KINDS:
        h = np.asarray(ps_interp(tx, rx, kind, avg_blocks=1))
        assert np.abs(h[list(C.PILOT_IDX)] - hp).max() < 1e-12, kind


def test_spline_equals_matlab_cubic(capture):
    a = ps_interp(jnp.asarray(capture.tx_symb), jnp.asarray(capture.rx_symb), "spline")
    b = ps_interp(jnp.asarray(capture.tx_symb), jnp.asarray(capture.rx_symb), "cubic")
    assert _rel_err(a, b) == 0.0


@pytest.mark.parametrize("mode", MODES)
def test_ps_mmse_vs_oracle(capture, mode):
    """Framework's rank-1 closed form vs the oracle's dense 53×53 inverse."""
    h_lt = oracle.lt_ls_oracle(capture.tx_preamble_fft, capture.rx_preamble_fft, mode)
    want = oracle.ps_mmse_oracle(
        capture.tx_symb, capture.rx_symb, capture.ow2, h_lt, mode
    )
    got = ps_mmse(
        jnp.asarray(capture.tx_symb),
        jnp.asarray(capture.rx_symb),
        capture.ow2,
        jnp.asarray(np.asarray(h_lt, np.complex128)),
        mode=mode,
    )
    assert _rel_err(got, want) < 1e-8


def test_mmse_solvers_agree(capture):
    """sm (Sherman-Morrison) and dense (batched solve) paths are the same
    math — they must agree to f64 roundoff."""
    h_lt = lt_ls(
        jnp.asarray(capture.tx_preamble_fft), jnp.asarray(capture.rx_preamble_fft)
    )
    args = (
        jnp.asarray(capture.tx_symb),
        jnp.asarray(capture.rx_symb),
        capture.ow2,
        h_lt,
    )
    a = ps_mmse(*args, solver="sm")
    b = ps_mmse(*args, solver="dense")
    assert _rel_err(a, b) < 1e-9


def test_batched_consistency(capture):
    """Broadcasting over a frame batch must equal per-frame evaluation."""
    rng = np.random.default_rng(0)
    txb = np.stack([capture.tx_symb] * 3)
    rxb = np.stack(
        [capture.rx_symb * (1 + 0.1 * rng.standard_normal((15, 53))) for _ in range(3)]
    )
    batched = np.asarray(ps_interp(jnp.asarray(txb), jnp.asarray(rxb), "sinc"))
    for i in range(3):
        single = np.asarray(ps_interp(jnp.asarray(txb[i]), jnp.asarray(rxb[i]), "sinc"))
        np.testing.assert_allclose(batched[i], single, rtol=1e-12)


def test_mmse_sigma_infinity_shrinks_to_zero(capture):
    """Property: as σ²→∞ the MMSE estimate shrinks toward 0 (the prior
    dominates) — s = uᴴrx/(σ²+‖u‖²) → 0."""
    h_lt = lt_ls(
        jnp.asarray(capture.tx_preamble_fft), jnp.asarray(capture.rx_preamble_fft)
    )
    h_small = ps_mmse(
        jnp.asarray(capture.tx_symb), jnp.asarray(capture.rx_symb), 1e12, h_lt
    )
    assert np.abs(np.asarray(h_small)).max() < 1e-9


def test_mmse_sigma_zero_projects_onto_h_lt(capture):
    """Property: as σ²→0, H = v·(uᴴrx/‖u‖²) — the projection coefficient
    of rx onto u; with rx = tx⊙H_true + 0 noise and H_LT exact, s → 1."""
    tx = jnp.asarray(capture.tx_symb)
    h_lt = lt_ls(
        jnp.asarray(capture.tx_preamble_fft), jnp.asarray(capture.rx_preamble_fft)
    )
    rx_clean = tx * h_lt[None, :]  # channel exactly h_lt, no noise
    h = ps_mmse(tx, rx_clean, 0.0, h_lt)
    assert _rel_err(h, np.asarray(h_lt)) < 1e-10
