from ssl_audio_tpu.augment.augmentations import (  # noqa: F401
    MixupState,
    init_mixup_state,
    mix_gaussian_noise,
    mixup_byola,
    normalize_batch,
    random_linear_fader,
    random_resize_crop,
)
from ssl_audio_tpu.augment.transforms import (  # noqa: F401
    AugmentState,
    init_augment_state,
    make_pair_views,
)
