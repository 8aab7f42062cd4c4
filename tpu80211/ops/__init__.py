from tpu80211.ops.blocks import (
    extract_blocks,
    preamble_fft,
    noise_power_estimate,
)
from tpu80211.ops.interp import interp_matrix
from tpu80211.ops.linalg import dft_matrix, idft_apply
from tpu80211.ops.equalize import equalize

__all__ = [
    "extract_blocks",
    "preamble_fft",
    "noise_power_estimate",
    "interp_matrix",
    "dft_matrix",
    "idft_apply",
    "equalize",
]
