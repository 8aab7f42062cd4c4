"""Golden gates vs the reference's *actual MATLAB-computed* outputs.

`/root/reference/matlab.mat` is the saved workspace of a WiFi_RX.m run
(WiFi_RX.m:46-60): it holds the MATLAB-computed estimator outputs
``H_EST_LT_LS`` / ``H_EST_PS_{Linear,Cubic,Sinc,Third}`` (53-vector,
block-1-4 averaged per WiFi_channel_estimation_PS_Linear.m:23) and the
full-chain equalized symbols ``eq_symbols`` (53x15,
WiFi_Equalization.m:3-8).  Its time-domain inputs are bit-identical to the
repo's extracted capture (asserted below), so every golden vector is
gateable through the repo's own front end — the MATLAB-mode twin of the
compiled-C-binary anchor in test_golden_ref.py.

The workspace contains no ``H_EST_PS_MMSE`` (the MATLAB MMSE result was
not saved), pinned below the way test_golden_ref.py pins the C binary's
all-NaN MMSE: no external MMSE anchor exists; MMSE parity bottoms out at
the repo's two independent 80-bit oracles (PARITY_MAP.md "Parity anchor").
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from tpu80211.config import EstimatorMode
from tpu80211.cplx import Cplx
from tpu80211.parity import oracle_np
from tpu80211.pipeline import rx as rx_cpx
from tpu80211.pipeline import sc

_MAT = pathlib.Path("/root/reference/matlab.mat")

pytestmark = pytest.mark.skipif(
    not _MAT.exists(), reason="reference matlab.mat not mounted"
)

# golden H_EST name per repo estimator name (MATLAB workspace names)
_GOLDEN = {
    "h_lt": "H_EST_LT_LS",
    "h_linear": "H_EST_PS_Linear",
    "h_cubic": "H_EST_PS_Cubic",
    "h_sinc": "H_EST_PS_Sinc",
    "h_spline": "H_EST_PS_Third",
}


@pytest.fixture(scope="module")
def mat():
    sio = pytest.importorskip("scipy.io")
    return sio.loadmat(_MAT)


def _rel(a, b):
    a = np.asarray(a, np.complex128)
    b = np.asarray(b, np.complex128)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)


def test_mat_inputs_bit_identical_to_capture(mat, capture):
    """matlab.mat's time-domain inputs == the repo capture (same capture,
    so the golden vectors below gate the repo front end end-to-end)."""
    for name in ("tx_packet", "rx_packet", "tx_lptot", "rx_lptot"):
        assert np.array_equal(mat[name].ravel(), getattr(capture, name)), name
    # frequency-domain view too: MATLAB's extracted blocks == inputs.h's up
    # to the header's decimal printing precision (inputs.h literals carry
    # ~5 significant digits; measured max |diff| is 7.0e-5 at scale 8.9)
    assert np.allclose(mat["tx_symb"].T, capture.tx_symb, rtol=0, atol=2e-4)
    assert np.allclose(mat["rx_symb"].T, capture.rx_symb, rtol=0, atol=2e-4)


@pytest.fixture(scope="module")
def matlab_chain(capture):
    """Repo full chain (complex f64, MATLAB mode) from the raw time-domain
    capture — exercises front end + estimators + equalizer together."""
    return rx_cpx.rx_chain(
        jnp.asarray(capture.tx_packet),
        jnp.asarray(capture.rx_packet),
        jnp.asarray(capture.tx_lptot),
        jnp.asarray(capture.rx_lptot),
        mode=EstimatorMode.MATLAB,
    )


@pytest.mark.parametrize("name", sorted(_GOLDEN))
def test_estimators_vs_matlab_golden(matlab_chain, mat, name):
    """MATLAB-mode estimator == MATLAB's own saved H_EST (machine eps)."""
    want = mat[_GOLDEN[name]].ravel()
    assert _rel(getattr(matlab_chain, name), want) < 1e-12, name


def test_full_chain_eq_vs_matlab_golden(matlab_chain, mat):
    """Time-domain capture in → equalized symbols out == MATLAB's
    eq_symbols (53x15, WiFi_Equalization.m:3-8) — the only end-to-end
    golden record of M1+M3+M4.  WiFi_RX.m:60 equalizes with PS-Linear,
    which is the repo default (equalize_with="h_linear")."""
    assert _rel(matlab_chain.eq, mat["eq_symbols"].T) < 1e-12


def test_noise_power_vs_reference_constant(matlab_chain, capture):
    """Front-end sigma^2 == the C header's frozen OW2 (inputs.h:18, printed
    to 5 digits there) == WiFi_RX.m:31's formula."""
    assert abs(float(matlab_chain.ow2) - capture.ow2) < 1e-12 * 1e5 or (
        abs(float(matlab_chain.ow2) - capture.ow2) / capture.ow2 < 1e-4
    )


def test_math_mode_interp_equals_matlab_for_real_capture(matlab_chain, mat, capture):
    """On the shipped capture MATH mode == MATLAB mode for every
    interpolator except cubic-in-C-parity: the modes differ only in the
    MMSE X4 slip and the C cubic denominators (config.EstimatorMode)."""
    out = rx_cpx.rx_chain(
        jnp.asarray(capture.tx_packet),
        jnp.asarray(capture.rx_packet),
        jnp.asarray(capture.tx_lptot),
        jnp.asarray(capture.rx_lptot),
        mode=EstimatorMode.MATH,
    )
    for name in ("h_lt", "h_linear", "h_cubic", "h_sinc", "h_spline"):
        assert _rel(getattr(out, name), mat[_GOLDEN[name]].ravel()) < 1e-12


def _np_frontend(capture):
    """MATLAB front end (WiFi_RX.m:19-29, WiFi_blocks_extraction.m) in plain
    NumPy complex128 — feeds the oracle the exact frequency-domain view the
    MATLAB run saw (the inputs.h literals are decimal-truncated to ~5
    digits, so they cannot anchor a <1e-12 gate)."""

    def pre(lptot):
        avg = (lptot[-64:] + lptot[-128:-64]) / 2
        return np.roll(np.fft.fft(avg, 64), 26)[:53]

    def blocks(packet):
        b = packet.reshape(15, 80)[:, 16:]
        return np.roll(np.fft.fft(b, 64, axis=-1), 26, axis=-1)[:, :53]

    return (
        pre(capture.tx_lptot),
        pre(capture.rx_lptot),
        blocks(capture.tx_packet),
        blocks(capture.rx_packet),
    )


def test_oracle_np_matlab_mode_vs_matlab_golden(mat, capture):
    """The 80-bit NumPy oracle's MATLAB mode is itself anchored to actual
    MATLAB output (cross-check: oracle != just self-consistent)."""
    tx_pre, rx_pre, tx_symb, rx_symb = _np_frontend(capture)
    h_lt = oracle_np.lt_ls_oracle(tx_pre, rx_pre, EstimatorMode.MATLAB)
    assert _rel(h_lt, mat["H_EST_LT_LS"].ravel()) < 1e-12
    for kind, key in (
        ("linear", "H_EST_PS_Linear"),
        ("cubic", "H_EST_PS_Cubic"),
        ("sinc", "H_EST_PS_Sinc"),
        ("spline", "H_EST_PS_Third"),
    ):
        got = oracle_np.ps_interp_oracle(
            tx_symb, rx_symb, kind, EstimatorMode.MATLAB
        )
        assert _rel(got, mat[key].ravel()) < 1e-12, kind
    h_lin = oracle_np.ps_interp_oracle(
        tx_symb, rx_symb, "linear", EstimatorMode.MATLAB
    )
    eq = oracle_np.equalize_oracle(rx_symb, h_lt, h_lin)
    assert _rel(eq, mat["eq_symbols"].T) < 1e-12


def test_sc_chain_vs_matlab_golden(mat, capture):
    """Split-complex f32 production chain vs actual MATLAB output, within
    the f32/SNR tolerance (the same bar as test_chain_parity.py)."""
    out = sc.rx_chain(
        Cplx.from_complex(capture.tx_packet),
        Cplx.from_complex(capture.rx_packet),
        Cplx.from_complex(capture.tx_lptot),
        Cplx.from_complex(capture.rx_lptot),
    )
    for name in ("h_lt", "h_linear", "h_sinc"):
        got = getattr(out, name).to_complex()
        assert _rel(got, mat[_GOLDEN[name]].ravel()) < 1e-4, name
    # cubic/spline subtract near-equal pilot ratios (divided differences):
    # absolute error is still f32-eps-scale but the relative bar is looser
    for name in ("h_cubic", "h_spline"):
        got = getattr(out, name).to_complex()
        assert _rel(got, mat[_GOLDEN[name]].ravel()) < 5e-3, name
    assert _rel(out.eq.to_complex(), mat["eq_symbols"].T) < 1e-3


def test_matlab_mmse_absent_from_workspace(mat):
    """Pin the negative fact: matlab.mat holds no H_EST_PS_MMSE, so no
    external MMSE anchor exists anywhere (the compiled C binary's MMSE is
    all-NaN, test_golden_ref.py).  If a future reference drop adds one,
    this fails and the MMSE gates should be upgraded to use it."""
    assert "H_EST_PS_MMSE" not in mat
    # ...while the five interpolator golds are present
    for key in _GOLDEN.values():
        assert key in mat, key
