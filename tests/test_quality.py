"""Quality benchmark (bench/quality.py): sanity of the accuracy metrics
the reference never published (its record is eyeballed PNGs, SURVEY.md §6)."""

import numpy as np

from tpu80211.bench import quality


def test_quality_sweep_ordering():
    rows = quality.quality_sweep((10.0, 30.0), batch=128)
    lo, hi = rows
    # estimators that use the full preamble track the SNR floor:
    # NMSE improves ~1 dB per SNR dB
    for name in ("lt_ls", "ps_mmse"):
        assert hi["estimators"][name]["nmse_db"] < lo["estimators"][name]["nmse_db"] - 15
        # within ~3 dB of the SNR floor
        assert abs(hi["estimators"][name]["nmse_db"] + 30.0) < 3.0
    # BER improves with SNR for every estimator
    for name, m in hi["estimators"].items():
        assert m["ber"] <= lo["estimators"][name]["ber"] + 1e-3, name
    # MMSE (uses noise statistics) is at least as good as plain pilot
    # interpolation at low SNR
    assert (
        lo["estimators"]["ps_mmse"]["nmse_db"]
        <= lo["estimators"]["ps_linear"]["nmse_db"] + 1.0
    )


def test_quality_plot(tmp_path):
    rows = quality.quality_sweep((10.0, 30.0), batch=64)
    out = quality.plot_quality(rows, str(tmp_path / "q.png"))
    import pathlib

    assert pathlib.Path(out).stat().st_size > 1000


def test_wiener_interp_quality():
    """The Wiener pilot interpolator (MMSE-optimal linear map, beyond the
    reference) is at least as accurate as sinc interpolation at low SNR,
    and both split-complex and complex-dtype paths agree."""
    import jax
    import jax.numpy as jnp

    from tpu80211.cplx import Cplx
    from tpu80211.datasets import synthetic
    from tpu80211.models import ps_interp
    from tpu80211.pipeline import sc
    from tpu80211.utils import metrics

    fb = synthetic.generate(jax.random.PRNGKey(7), 256, snr_db=10.0,
                            dtype=jnp.complex64)
    h_wiener = ps_interp(fb.tx_symb, fb.rx_symb, "wiener")
    h_sinc = ps_interp(fb.tx_symb, fb.rx_symb, "sinc")
    nm_w = metrics.cfr_nmse_db(h_wiener, fb.h_true)
    nm_s = metrics.cfr_nmse_db(h_sinc, fb.h_true)
    assert nm_w <= nm_s + 0.1, (nm_w, nm_s)

    got = sc.ps_interp(
        Cplx.from_complex(fb.tx_symb), Cplx.from_complex(fb.rx_symb), "wiener"
    ).to_complex()
    rel = np.abs(np.asarray(got) - np.asarray(h_wiener)).max()
    rel /= np.abs(np.asarray(h_wiener)).max()
    assert rel < 1e-5, rel
