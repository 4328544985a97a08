from ssl_audio_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    init_distributed,
    place_state,
    replicated,
    shard_batch,
    state_shardings,
)
