"""Native C++ 80-bit oracle vs the NumPy clongdouble oracle vs JAX paths.

Three independent implementations (C++ long double, NumPy clongdouble
scalar loops, batched JAX) agreeing on the shipped capture is the parity
gate SURVEY.md §4 calls for — the capability the reference only had as
manual eyeballing of printf output.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu80211 import constants as C
from tpu80211.config import EstimatorMode
from tpu80211.models import lt_ls, ps_interp, ps_mmse
from tpu80211.parity import oracle_np
from tpu80211.parity import oracle_native as nat

MODES = [EstimatorMode.MATH, EstimatorMode.MATLAB, EstimatorMode.C_PARITY]


def _rel(a, b):
    a = np.asarray(a, np.complex128)
    b = np.asarray(b, np.complex128)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)


@pytest.fixture(scope="module", autouse=True)
def _built():
    nat._lib()  # compiles native/oracle.cpp on first use


@pytest.mark.parametrize("mode", MODES)
def test_lt_ls(capture, mode):
    got = nat.lt_ls(capture.tx_preamble_fft, capture.rx_preamble_fft, mode)
    want = oracle_np.lt_ls_oracle(
        capture.tx_preamble_fft, capture.rx_preamble_fft, mode
    )
    assert _rel(got, want) < 1e-15


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("kind", ["linear", "cubic", "sinc", "spline"])
def test_ps_interp(capture, mode, kind):
    got = nat.ps_interp(capture.tx_symb, capture.rx_symb, kind, mode)
    want = oracle_np.ps_interp_oracle(capture.tx_symb, capture.rx_symb, kind, mode)
    assert _rel(got, want) < 1e-14
    got_jax = ps_interp(
        jnp.asarray(capture.tx_symb), jnp.asarray(capture.rx_symb), kind, mode=mode
    )
    assert _rel(got_jax, got) < 1e-10


@pytest.mark.parametrize("mode", MODES)
def test_ps_mmse(capture, mode):
    h_lt = nat.lt_ls(capture.tx_preamble_fft, capture.rx_preamble_fft, mode)
    got = nat.ps_mmse(capture.tx_symb, capture.rx_symb, capture.ow2, h_lt, mode)
    want = oracle_np.ps_mmse_oracle(
        capture.tx_symb, capture.rx_symb, capture.ow2,
        np.asarray(h_lt, np.complex128), mode,
    )
    assert _rel(got, want) < 1e-9
    got_jax = ps_mmse(
        jnp.asarray(capture.tx_symb),
        jnp.asarray(capture.rx_symb),
        capture.ow2,
        jnp.asarray(h_lt),
        mode=mode,
    )
    assert _rel(got_jax, got) < 1e-8


def test_cofactor_inverse_matches_gauss_small():
    """The reference-shaped cofactor/adjugate inverse (utils.c:141-170
    behavioral spec) agrees with Gauss-Jordan.  Checked at n=10: at n=53
    one cofactor inverse is 53² condensation determinants — minutes of x87
    long-double time, and the pivot-free condensation loses digits on
    random matrices (the reference's own numerics)."""
    rng = np.random.default_rng(1)
    n = 10
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a += n * np.eye(n)
    y_cof = nat.inverse(a, use_cofactor=True)
    y_gau = nat.inverse(a, use_cofactor=False)
    assert np.abs(y_cof - y_gau).max() / np.abs(y_gau).max() < 1e-10
    assert np.abs(y_gau @ a - np.eye(n)).max() < 1e-12


def test_inverse53_gauss_identity():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((C.N_SC, C.N_SC)) + 1j * rng.standard_normal(
        (C.N_SC, C.N_SC)
    )
    a += C.N_SC * np.eye(C.N_SC)  # well-conditioned
    y = nat.inverse(a, use_cofactor=False)
    err = np.abs(y @ a - np.eye(C.N_SC)).max()
    assert err < 1e-10, err


def test_equalize(capture):
    h_lt = nat.lt_ls(capture.tx_preamble_fft, capture.rx_preamble_fft,
                     EstimatorMode.MATH)
    h_ps = nat.ps_interp(capture.tx_symb, capture.rx_symb, "linear")
    got = nat.equalize(capture.rx_symb, h_lt, h_ps)
    want = oracle_np.equalize_oracle(
        capture.rx_symb, np.asarray(h_lt, np.complex128),
        np.asarray(h_ps, np.complex128),
    )
    assert _rel(got, want) < 1e-14


@pytest.mark.parametrize("n", [3, 6, 8])
def test_determinant_three_algorithms_agree(n):
    """The reference's own (commented-out) determinant self-check
    (main_openmp.c:216-245), made real: condensation == elimination ==
    Laplace == numpy on random complex matrices."""
    rng = np.random.default_rng(n)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    want = np.linalg.det(a)
    for method in ("condensation", "elimination", "laplace"):
        got = nat.determinant(a, method)
        assert abs(got - want) / abs(want) < 1e-10, (method, got, want)


def test_determinant_53_elimination_vs_condensation():
    """Condensation vs pivoted elimination on the reference's actual
    53×53 use case — the raw DFT matrix (main.c:186) — and on a
    diagonally-dominant random matrix."""
    from tpu80211.ops.linalg import dft_matrix

    a = dft_matrix()
    d1 = nat.determinant(a, "elimination")
    d2 = nat.determinant(a, "condensation")
    assert abs(d1 - d2) / abs(d1) < 1e-6

    rng = np.random.default_rng(7)
    b = rng.standard_normal((53, 53)) + 1j * rng.standard_normal((53, 53))
    b += 8 * np.eye(53)
    d1 = nat.determinant(b, "elimination")
    d2 = nat.determinant(b, "condensation")
    assert abs(d1 - d2) / abs(d1) < 1e-8
