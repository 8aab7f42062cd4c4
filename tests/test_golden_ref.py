"""Parity gate against the ACTUALLY-COMPILED reference binary.

Round 1 gated C_PARITY mode against two self-written oracles
(parity/oracle_np.py, native/oracle.cpp) — a shared misreading of
/root/reference/main.c:66-212 would have passed undetected (VERDICT.md
missing#1).  This file closes that gap: native/refbuild/ compiles the
reference's own main.c + utils.c (unmodified, via stub mpi.h/omp.h) and
capture_golden.py records every estimator's H_EST on the shipped inputs.h
dataset into tests/golden/ref_h_est.npz at full long-double precision
(%La hex floats).  These tests fail if either the oracle or the JAX
C_PARITY path diverges from the reference's actual output.

Finding recorded here as an assertion: the reference's sequential PS-MMSE
output is deterministically **all-NaN** on its own dataset.  Cause chain:
`addition` computes M1+M1 (utils.c:117), so Ryy = 2σ²I (diagonal); the
cofactor inverse (utils.c:141-170) then takes minors of a diagonal matrix,
whose off-diagonal minors contain an all-zero leading row; the condensation
determinant (utils.c:557, `mat[i][0]*mat[0][j]/mat[0][0]`) divides by that
zero pivot without pivoting → NaN, which propagates into every H_EST entry.
(Verified against the compiled binary; the reference only ever *timed* its
MMSE — main.c:52-54 prints no values — so this was invisible upstream.)
Consequently there is no finite reference MMSE output to match, and the
MMSE C_PARITY gate remains against the pivoting 80-bit oracles
(tests/test_estimators.py::test_ps_mmse_vs_oracle).
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from tpu80211.config import EstimatorMode
from tpu80211.models import lt_ls, ps_interp
from tpu80211.parity import oracle_np as oracle

GOLDEN = pathlib.Path(__file__).parent / "golden" / "ref_h_est.npz"

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(),
    reason="golden vectors not captured (run `make -C native/refbuild golden`)",
)


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def _rel(got, want):
    got = np.asarray(got, np.complex128)
    want = np.asarray(want, np.complex128)
    return np.abs(got - want).max() / np.abs(want).max()


def test_golden_lt_ls(capture, golden):
    want = golden["block0_lt_ls"]
    got_oracle = oracle.lt_ls_oracle(
        capture.tx_preamble_fft, capture.rx_preamble_fft, EstimatorMode.C_PARITY
    )
    # oracle is clongdouble, binary is long double: identical algorithm,
    # identical precision — agreement must be at the 80-bit noise floor
    assert _rel(got_oracle, want) < 1e-15
    got_jax = lt_ls(
        jnp.asarray(capture.tx_preamble_fft),
        jnp.asarray(capture.rx_preamble_fft),
        mode=EstimatorMode.C_PARITY,
    )
    assert _rel(got_jax, want) < 1e-12  # f64 vs 80-bit


@pytest.mark.parametrize("kind,est", [
    ("linear", "ps_linear"), ("cubic", "ps_cubic"), ("sinc", "ps_sinc"),
])
def test_golden_ps_interp(capture, golden, kind, est):
    want = golden[f"block0_{est}"]
    got_oracle = oracle.ps_interp_oracle(
        capture.tx_symb, capture.rx_symb, kind, EstimatorMode.C_PARITY
    )
    assert _rel(got_oracle, want) < 1e-14
    got_jax = ps_interp(
        jnp.asarray(capture.tx_symb),
        jnp.asarray(capture.rx_symb),
        kind,
        mode=EstimatorMode.C_PARITY,
    )
    assert _rel(got_jax, want) < 1e-11


# the reference driver defaults to block 0 (main.c:16,29-33); refdriver.cpp
# takes the block index as an argument, and capture_golden.py records all
# 15 — gate a spread of them so the interp parity holds beyond the single
# block the reference itself ever ran (VERDICT round-2 task 8)
@pytest.mark.parametrize("block", [1, 3, 7, 11, 14])
@pytest.mark.parametrize("kind,est", [
    ("linear", "ps_linear"), ("cubic", "ps_cubic"), ("sinc", "ps_sinc"),
])
def test_golden_ps_interp_other_blocks(capture, golden, block, kind, est):
    key = f"block{block}_{est}"
    if key not in golden:
        pytest.skip("multi-block golden not captured yet "
                    "(run `make -C native/refbuild golden` with all blocks)")
    want = golden[key]
    tx_b = capture.tx_symb[block:block + 1]
    rx_b = capture.rx_symb[block:block + 1]
    got_oracle = oracle.ps_interp_oracle(
        tx_b, rx_b, kind, EstimatorMode.C_PARITY
    )
    assert _rel(got_oracle, want) < 1e-14
    got_jax = ps_interp(
        jnp.asarray(tx_b), jnp.asarray(rx_b), kind,
        mode=EstimatorMode.C_PARITY,
    )
    assert _rel(got_jax, want) < 1e-11


def test_golden_lt_ls_block_invariant(golden):
    """LT-LS uses only the preamble — the captured vectors must be
    identical across blocks (a changed value would mean the capture runs
    were inconsistent)."""
    blocks = sorted({int(k.split("_")[0][5:]) for k in golden})
    for b in blocks[1:]:
        np.testing.assert_array_equal(
            golden[f"block{b}_lt_ls"], golden["block0_lt_ls"]
        )


def test_reference_mmse_is_nan(golden):
    """The reference binary's own PS-MMSE output is all-NaN (see module
    docstring for the mechanism).  This assertion pins the captured fact so
    a future re-capture that suddenly produces finite values (i.e. a
    different reference build) is flagged instead of silently re-anchoring.
    The mechanism is data-independent (Ryy = 2σ²I for every input), so it
    holds for every captured block."""
    blocks = sorted({int(k.split("_")[0][5:]) for k in golden})
    for b in blocks:
        h = golden[f"block{b}_ps_mmse"]
        assert h.shape == (53,)
        assert np.isnan(h.real).all() and np.isnan(h.imag).all(), b
