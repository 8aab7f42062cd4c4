from tpu80211.parallel.mesh import (
    DP,
    BLK,
    make_mesh,
    frame_sharding,
    shard_batch,
    rx_chain_dp,
    rx_step_shardmap,
    pad_blocks,
)

__all__ = [
    "DP",
    "BLK",
    "make_mesh",
    "frame_sharding",
    "shard_batch",
    "rx_chain_dp",
    "rx_step_shardmap",
    "pad_blocks",
]
