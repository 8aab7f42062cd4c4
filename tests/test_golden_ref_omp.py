"""Behavioral anchor for the reference's OPENMP estimators (C4).

main_openmp.c:70-276 is a THIRD independent implementation of the five
estimators (not the sequential code with pragmas: PS_Linear/Cubic/Sinc
index subcarriers by THREAD ID inside 53-thread teams,
main_openmp.c:92-93/132/150-170, and MMSE dispatches to the *_omp
kernel twins in utils.c).  native/refbuild compiles it unmodified with
real -fopenmp (`make -C native/refbuild golden_omp`; the no-op shim
would execute only thread 0 → only H_EST[0]) and captures block 0 into
tests/golden/ref_h_est_omp.npz — bit-deterministic across three runs.

These tests pin the captured behavior against the sequential golden
(ref_h_est.npz):

* LT-LS / PS-Linear / PS-Cubic / PS-Sinc: the thread-per-subcarrier
  decomposition computes THE SAME values as the sequential loops (each
  thread owns disjoint subcarriers; same long-double expressions) — so
  the OpenMP rewrite is value-preserving, unlike the MPI one
  (test_golden_ref_mpi.py: imag-drop and imag-ramp quirks).
* PS-MMSE: all-NaN, like the sequential and MPI records — the shared
  mechanism (Ryy = 2σ²I via the addition M1+M1 bug + the unpivoted
  condensation determinant, here the knowingly-racy
  determinant_impl_omp, utils.c:646-656) terminates in NaN on every
  path the reference ships.
"""

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
OMP = GOLDEN_DIR / "ref_h_est_omp.npz"
SEQ = GOLDEN_DIR / "ref_h_est.npz"

pytestmark = pytest.mark.skipif(
    not (OMP.exists() and SEQ.exists()),
    reason="OpenMP golden not captured (make -C native/refbuild golden_omp)",
)


@pytest.fixture(scope="module")
def omp():
    return dict(np.load(OMP))


@pytest.fixture(scope="module")
def seq():
    return dict(np.load(SEQ))


@pytest.mark.parametrize("name", ["lt_ls", "ps_linear", "ps_cubic",
                                  "ps_sinc"])
def test_omp_interpolators_match_sequential(omp, seq, name):
    got = omp[f"{name}_omp"]
    want = seq[f"block0_{name}"]
    assert got.shape == (53,)
    assert np.isfinite(got).all()
    # same long-double expressions on disjoint thread-owned subcarriers:
    # tolerance = one long-double->double rounding
    np.testing.assert_allclose(got, want, rtol=1e-15, atol=1e-18)


def test_omp_mmse_all_nan_like_every_other_path(omp, seq):
    h = omp["ps_mmse_omp"]
    assert np.isnan(h.real).all() and np.isnan(h.imag).all()
    assert np.isnan(seq["block0_ps_mmse"]).all()
