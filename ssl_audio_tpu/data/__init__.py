from ssl_audio_tpu.data.datasets import (  # noqa: F401
    AudioSet,
    FSD50K,
    LibriSpeech,
    NSynthHEAR,
    SyntheticLMS,
    calculate_norm_stats,
    make_index_dict,
)
from ssl_audio_tpu.data.pipeline import DataLoader  # noqa: F401
