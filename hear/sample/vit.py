"""HEAR API module for ViT encoders (reference hear/sample/vit.py layout)."""
from ssl_audio_tpu.hear.vit import (  # noqa: F401
    BATCH_SIZE,
    TIMESTAMP_FRAME_DUR,
    TIMESTAMP_HOP_SIZE,
    ViTModelWrapper,
    get_scene_embeddings,
    get_timestamp_embeddings,
    load_model,
)
