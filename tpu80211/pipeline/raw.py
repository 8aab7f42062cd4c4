"""Raw-sample-stream receiver: detect → extract → full chain, on device.

The complete system the reference's WiFi_RX.m promises (threshold
detection, WiFi_RX.m:7) but never composes: raw ADC-style sample streams
in, channel estimates + equalized symbols out.  All three stages are
device-resident and lane-major:

  1. ``kernels/detect_kernel.detect_and_align`` — ONE kernel pass:
     Schmidl&Cox + MXU matched filter + timing advance + per-lane
     barrel-shift extraction in VMEM (the raw stream is read from HBM
     exactly once; only the 1360 aligned samples per stream leave);
  2. ``kernels/fused_chain.py`` tx-const kernel — the 7-estimator chain.

Undetected streams are processed at offset 0 (static shapes — XLA
cannot skip them) and flagged: gate on ``detected`` before consuming
the estimates.
"""

from __future__ import annotations

from tpu80211.cplx import Cplx
from tpu80211.kernels.detect_kernel import detect_and_align
from tpu80211.kernels.fused_chain import fused_rx_chain_txconst


def raw_rx_txconst(x: Cplx, lts_ref: Cplx, txs: Cplx, tpre: Cplx,
                   threshold: float | None = None, eps=0.0,
                   serve: bool = False, sync: bool = False,
                   search: int = 192, advance: int = 4,
                   wiener_model: str | None = None,
                   wiener_snr_db: float | None = None,
                   equalize_with: str = "h_linear") -> dict:
    """Full raw-stream receiver for a lane-major (NS, B) stream batch.

    ``lts_ref``: (64,) known time-domain LTS (detect_kernel reference);
    ``txs``/``tpre``: the tx-constant spectra (fused_chain.tx_spectra).
    Returns the fused-chain output dict plus ``detected``/``start``/
    ``metric`` rows from the detector.  ``eps`` is the bench
    serialization hook, applied inside the chain kernel (detection is
    scale-free — its normalized metric cancels any input gain)."""
    kw = {} if threshold is None else {"threshold": threshold}
    det, lp, pkt = detect_and_align(x, lts_ref, search=search,
                                    advance=advance, **kw)
    out = fused_rx_chain_txconst(txs, tpre, pkt, lp, eps=eps, serve=serve,
                                 sync=sync, wiener_model=wiener_model,
                                 wiener_snr_db=wiener_snr_db,
                                 equalize_with=equalize_with)
    out["detected"] = det["detected"]
    out["start"] = det["start"]
    out["metric"] = det["metric"]
    return out
