from ssl_audio_tpu.hear.utils import (  # noqa: F401
    AttrDict,
    compute_scene_stats,
    compute_timestamp_stats,
    frame_audio,
    load_yaml_config,
)
