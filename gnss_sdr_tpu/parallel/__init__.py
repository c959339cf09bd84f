from .sharding import (  # noqa: F401
    CHANNEL_AXIS,
    TIME_AXIS,
    make_mesh,
    shard_channel_state,
    shard_fused_step,
    sharded_pcps_search,
    sharded_track_block,
    time_sharded_pcps_search,
)
from .distributed import (  # noqa: F401
    TimeShard,
    global_mesh,
    initialize_from_env,
    merge_shard_results,
    partition_stream,
)
