from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram, mel_filterbank  # noqa: F401
from ssl_audio_tpu.ops.pos_embed import (  # noqa: F401
    get_2d_sincos_pos_embed,
    get_sinusoid_encoding_table,
)
