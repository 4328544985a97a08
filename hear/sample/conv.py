"""HEAR API module for conv encoders (reference hear/sample/conv.py layout)."""
from ssl_audio_tpu.hear.conv import (  # noqa: F401
    ConvModelWrapper,
    get_scene_embeddings,
    get_timestamp_embeddings,
    load_model,
)
