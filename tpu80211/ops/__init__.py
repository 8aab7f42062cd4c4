from tpu80211.ops.blocks import (
    extract_blocks,
    preamble_fft,
    noise_power_estimate,
)
from tpu80211.ops.channel import CHANNEL_MODELS, pdp
from tpu80211.ops.detect import detect_packet, extract_packet
from tpu80211.ops.interp import interp_matrix
from tpu80211.ops.linalg import dft_matrix, idft_apply
from tpu80211.ops.equalize import equalize

__all__ = [
    "extract_blocks",
    "preamble_fft",
    "noise_power_estimate",
    "CHANNEL_MODELS",
    "pdp",
    "detect_packet",
    "extract_packet",
    "interp_matrix",
    "dft_matrix",
    "idft_apply",
    "equalize",
]
