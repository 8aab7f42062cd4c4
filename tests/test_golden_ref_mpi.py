"""Behavioral anchor for the reference's DISTRIBUTED estimators.

VERDICT round-4 missing#2: the MPI variants (/root/reference/
main_mpi.c:168-1013, 846 LoC + utils.c:273-353 inverse_mpi) compute
*different* outputs than the sequential path — MPI LT-LS drops every
imaginary part (main_mpi.c:186,197,212, SURVEY quirk 4) — and nothing
pinned what they actually emit.  native/refbuild now compiles them
unmodified against a loopback MPI (mpiloop/, every rank a thread) and
captures rank 0's results into tests/golden/ref_h_est_mpi.npz
(capture_golden_mpi.py; bit-deterministic across runs).

These tests pin that captured behavior and its exact relationship to
the sequential golden (ref_h_est.npz):

* quirk 4, precisely: WORKER-computed subcarriers get imag == real
  (res_imag = creal(...), main_mpi.c:197); the four RANK-0-computed
  subcarriers {0,15,30,45} (= 0 + task*15, main_mpi.c:207) get imag == 0
  (H_EST[index] = creal(...), main_mpi.c:212); real parts equal the
  sequential LT-LS everywhere, whose imag (= imag(rx/tx), genuinely
  nonzero) the MPI variant therefore destroys.
* PS_Linear/PS_Sinc MPI == their sequential counterparts (same math,
  distributed); PS_Cubic MPI is a NEW quirk: the broadcast marshals the
  higher divided differences through cimag() OF A REAL (f012_i =
  cimag((f12_i−f01_i)/delta), main_mpi.c:403-408), so every
  imaginary divided difference beyond first order is 0 and the MPI
  cubic's imag is exactly the LINEAR ramp cimag(f0) + cimag(f01)·(k−P0)
  while its real is the sequential cubic's real.  Both Cubic and Sinc
  also commit the reference's OUT-OF-BOUNDS write: on round i=10 the
  gather loop stores H_EST[53] and H_EST[54] (k=53,54 ≥ SAMPUTIL ⇒
  group sums 0.0, but rank 0 stores them anyway,
  main_mpi.c:489-494/606-611) — captured into slack slots and pinned
  as exactly 0.
* PS_MMSE1/PS_MMSE2 are deterministically all-NaN, the same mechanism
  as the sequential MMSE (test_golden_ref.py docstring): Ryy = 2σ²I
  (the addition M1+M1 bug), and the unpivoted condensation determinant
  of its off-diagonal minors divides by zero.  inverse_mpi itself is
  NOT the culprit: its capture on the (dense) 53×53 DFT matrix is
  finite and equals the true inverse to 80-bit-rounding accuracy.
* Wiring note (not testable as a golden): main_mpi.c:140 passes
  (H_EST_PS_MMSE, H_EST_LT_LS) into MMSE1's (H_EST_LT, H_EST) params —
  as shipped, the MPI MMSE reads an UNINITIALIZED buffer as its LT
  estimate and overwrites the LT-LS result.  That behavior is stack
  garbage (nondeterministic) and cannot be captured; the golden uses
  the declared wiring (LT input = the MPI LT-LS output).
* Even the DEAD code is anchored: inverse_mpi_old (utils.c:201, the
  20-rank-hardcoded predecessor, run on exactly that layout) equals
  inverse_mpi bit-for-bit, and multiply_mpi (utils.c:770, never called,
  reads M1 for both factors) squares its operand — on the DFT matrix,
  F² = 53 × the index-reversal permutation, verified.

The repo deliberately does NOT reproduce quirk 4 (SURVEY §2.5 decision:
outright bugs are anchored, not re-implemented); rx_chain's math modes
are gated against the sequential golden elsewhere.
"""

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
MPI = GOLDEN_DIR / "ref_h_est_mpi.npz"
SEQ = GOLDEN_DIR / "ref_h_est.npz"

pytestmark = pytest.mark.skipif(
    not (MPI.exists() and SEQ.exists()),
    reason="MPI golden not captured (make -C native/refbuild golden_mpi)",
)

RANK0_IDX = [0, 15, 30, 45]  # 0 + task*15, numprocs=15 (main_mpi.c:172-174)
DC = 26


@pytest.fixture(scope="module")
def mpi():
    return dict(np.load(MPI))


@pytest.fixture(scope="module")
def seq():
    return dict(np.load(SEQ))


def test_lt_ls_mpi_imag_drop_quirk(mpi, seq):
    h = mpi["lt_ls_mpi"]
    assert h.shape == (53,)
    assert np.isfinite(h).all()
    worker = np.setdiff1d(np.arange(53), RANK0_IDX + [DC])
    # quirk 4: res_imag = creal(...) on worker ranks (main_mpi.c:197)
    np.testing.assert_array_equal(h[worker].imag, h[worker].real)
    # rank 0 stores creal(...) only -> imag exactly 0 (main_mpi.c:212)
    np.testing.assert_array_equal(h[RANK0_IDX].imag, 0.0)
    assert h[DC] == 0.0
    # real parts = the sequential LT-LS (identical formula, main.c:66-75);
    # tolerance = one long-double->double rounding
    np.testing.assert_allclose(h.real, seq["block0_lt_ls"].real,
                               rtol=1e-15, atol=1e-18)
    # the sequential result's imag (= imag(rx/tx), quirk 3: the real
    # "conj" cancels) is genuinely nonzero — quirk 4 destroys real
    # information, it does not just relabel a zero
    assert np.abs(seq["block0_lt_ls"].imag).max() > 1e-4


def test_ps_linear_mpi_matches_sequential(mpi, seq):
    np.testing.assert_allclose(mpi["ps_linear_mpi"], seq["block0_ps_linear"],
                               rtol=1e-15, atol=1e-18)


def test_ps_sinc_mpi_matches_sequential(mpi, seq):
    h = mpi["ps_sinc_mpi"]
    assert h.shape == (55,)  # 53 + the 2 out-of-bounds slots
    # the 4-term group MPI_SUM reassociates the sum — a few ulps only
    np.testing.assert_allclose(h[:53], seq["block0_ps_sinc"],
                               rtol=1e-13, atol=1e-16)
    # the captured out-of-bounds writes (main_mpi.c:606-611)
    np.testing.assert_array_equal(h[53:], 0.0)


def test_ps_cubic_mpi_imag_ramp_quirk(mpi, seq):
    """MPI cubic = sequential cubic's REAL + a first-order-only IMAG:
    main_mpi.c:403-408 marshal f012/f123/f0123 through cimag() of an
    already-real long double, zeroing every imaginary divided
    difference beyond f01."""
    h = mpi["ps_cubic_mpi"]
    assert h.shape == (55,)
    np.testing.assert_allclose(h[:53].real, seq["block0_ps_cubic"].real,
                               rtol=1e-13, atol=1e-16)
    # higher-order imag terms exist in the sequential cubic
    # (quirk is a loss, not a relabel)
    assert not np.allclose(h[:53].imag, seq["block0_ps_cubic"].imag,
                           atol=1e-6)
    # the surviving imag is exactly the linear ramp through (P0, P1)
    from tpu80211.datasets.loader import load_capture

    cap = load_capture()
    tx = np.asarray(cap.tx_symb)[0]
    rx = np.asarray(cap.rx_symb)[0]
    p = rx[[5, 19, 33, 47]] / tx[[5, 19, 33, 47]]  # H_PILOTS, P0..P3
    k = np.arange(53)
    want_imag = p[0].imag + ((p[1] - p[0]) / 14.0).imag * (k - 5)
    np.testing.assert_allclose(h[:53].imag, want_imag,
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_array_equal(h[53:], 0.0)


@pytest.mark.parametrize("name", ["ps_mmse1_mpi", "ps_mmse2_mpi"])
def test_mmse_mpi_all_nan_like_sequential(mpi, seq, name):
    h = mpi[name]
    assert np.isnan(h.real).all() and np.isnan(h.imag).all()
    # consistent with the sequential MMSE record (same Ryy=2σ²I + unpivoted
    # condensation mechanism, test_golden_ref.py)
    assert np.isnan(seq["block0_ps_mmse"]).all()


def test_inverse_mpi_old_matches_inverse_mpi(mpi):
    """utils.c:201-271 — the dead 20-rank-hardcoded predecessor of
    inverse_mpi, runnable only on exactly the 20-rank layout phase B
    provides (columns {rank, rank+20, rank+40<53}).  Same cofactor math,
    same determinant route ⇒ must equal inverse_mpi bit-for-bit."""
    np.testing.assert_array_equal(mpi["invF_mpi_old"], mpi["invF_mpi"])


def test_multiply_mpi_squares_its_first_operand(mpi):
    """utils.c:770-778 — dead row-range GEMM worker whose body reads M1
    for BOTH factors (`res[i][j] += M1[i][k]*M1[k][j]`; the `vec`
    parameter is ignored): captured on the DFT matrix, it computes F².
    For the 53-point DFT matrix F[c][r]=exp(−2πi·c·r/53), F² is 53·P
    where P is the index-reversal permutation (P[0,0]=1,
    P[i, 53−i]=1)."""
    got = mpi["multiply_mpi_F"]
    n = 53
    perm = np.zeros((n, n))
    perm[0, 0] = 1.0
    for i in range(1, n):
        perm[i, n - i] = 1.0
    assert np.abs(got - n * perm).max() < 1e-9


def test_inverse_mpi_is_the_true_inverse(mpi):
    """utils.c:273-353 (the hot distributed op) is finite and correct on
    the 53×53 DFT matrix — the NaN MMSE is the estimator composition's
    doing, not inverse_mpi's."""
    inv = mpi["invF_mpi"]
    assert np.isfinite(inv).all()
    n = 53
    t, f = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    # main_mpi.c:678 / refdriver_mpi.cpp: F[c][r] = exp(-2πi·c·r/53)
    fmat = np.exp(-2j * np.pi * t * f / n)
    want = np.linalg.inv(fmat)
    # the 80-bit condensation cofactor route loses ~9 digits through the
    # |det| ≈ 10^45.6 intermediate (measured max err 1.9e-9); the bound
    # is tight enough to catch any structural mistake
    assert np.abs(inv - want).max() < 5e-8
    # round-trip: ||F @ invF - I||_max at the same noise level
    assert np.abs(fmat @ inv - np.eye(n)).max() < 5e-6
