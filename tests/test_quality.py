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
