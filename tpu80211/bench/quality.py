"""Estimator quality benchmark: NMSE / EVM / BER versus SNR.

The reference publishes no accuracy numbers at all — its accuracy record
is four eyeballed CFR plot PNGs plus a saved MATLAB workspace
(SURVEY.md §6).  This module produces the quantitative version: for each
SNR point it generates a batch of synthetic frames with known ground-truth
CFR (datasets/synthetic.py), runs all six estimators, and reports

  * CFR NMSE (dB) per estimator against the true channel, and
  * post-equalization EVM and QPSK pseudo-BER per estimator (each
    estimator used as the PS side of the blended equalizer,
    WiFi_Equalization.m:6-7).

Runs on CPU with complex dtypes (the golden path, pipeline/rx.py's ops);
the TPU split-complex production path is quality-gated against this same
math by tests/test_fused_chain.py and tests/test_chain_parity.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu80211 import constants as C
from tpu80211.datasets import synthetic
from tpu80211.models import lt_ls, ps_interp, ps_mmse
from tpu80211.ops import equalize
from tpu80211.utils import metrics

KINDS = ("linear", "cubic", "sinc", "spline", "wiener")
DEFAULT_SNRS = (0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0)


def quality_point(snr_db: float, batch: int = 512, seed: int = 0) -> dict:
    """One SNR point: {estimator: {nmse_db, evm_rms, ber}} + metadata."""
    fb = synthetic.generate(
        jax.random.PRNGKey(seed), batch, snr_db=snr_db, dtype=jnp.complex64
    )
    txb, rxb = fb.tx_symb, fb.rx_symb
    h_lt = lt_ls(fb.tx_preamble_fft, fb.rx_preamble_fft)

    ests = {"lt_ls": h_lt}
    for kind in KINDS:
        ests[f"ps_{kind}"] = ps_interp(txb, rxb, kind)
    ests["ps_mmse"] = ps_mmse(txb, rxb, fb.ow2, h_lt)

    row = {"snr_db": float(snr_db), "batch": int(batch), "estimators": {}}
    for name, h in ests.items():
        eq = equalize(rxb, h_lt, h)
        row["estimators"][name] = {
            "nmse_db": round(metrics.cfr_nmse_db(h, fb.h_true), 2),
            "evm_rms": round(metrics.evm_rms(eq, txb), 4),
            "ber": round(metrics.qpsk_ber(eq, txb), 5),
        }
    return row


def quality_sweep(
    snrs: Sequence[float] = DEFAULT_SNRS, batch: int = 512, seed: int = 0
) -> list[dict]:
    return [quality_point(s, batch=batch, seed=seed + i)
            for i, s in enumerate(snrs)]


def plot_quality(rows: list[dict], out_path: str) -> str:
    """NMSE-vs-SNR curves per estimator → PNG (the quantitative successor
    of the reference's Real_Part/Imag_Part.png accuracy record)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(rows[0]["estimators"].keys())
    snrs = [r["snr_db"] for r in rows]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))
    for name in names:
        ax1.plot(snrs, [r["estimators"][name]["nmse_db"] for r in rows],
                 marker="o", label=name)
        ax2.semilogy(
            snrs,
            [max(r["estimators"][name]["ber"], 1e-6) for r in rows],
            marker="o", label=name,
        )
    ax1.set_xlabel("SNR (dB)")
    ax1.set_ylabel("CFR NMSE (dB)")
    ax1.set_title("Channel-estimation error")
    ax1.grid(True, alpha=0.3)
    ax2.set_xlabel("SNR (dB)")
    ax2.set_ylabel("QPSK BER (floor 1e-6)")
    ax2.set_title("Post-equalization BER (blended equalizer)")
    ax2.grid(True, alpha=0.3)
    ax2.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
