from .sharding import (  # noqa: F401
    CHANNEL_AXIS,
    TIME_AXIS,
    make_mesh,
    shard_channel_state,
    sharded_pcps_search,
    sharded_track_block,
    time_sharded_pcps_search,
)
