from ssl_audio_tpu.models.audiontt import AudioNTT2022  # noqa: F401
from ssl_audio_tpu.models.heads import BarlowTwinsHead, BarlowTwinsPredictor  # noqa: F401
from ssl_audio_tpu.models.resnet import (  # noqa: F401
    resnet18,
    resnet18_ReGP_NRF,
    resnet34,
    resnet50,
    resnet50_ReGP_NRF,
)
from ssl_audio_tpu.models.vit import MaskedAutoencoderViT, get_mae_vit  # noqa: F401
from ssl_audio_tpu.models.wrapper import build_encoder  # noqa: F401
