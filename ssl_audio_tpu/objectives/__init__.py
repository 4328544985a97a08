from ssl_audio_tpu.objectives.barlow import barlow_twins_loss, barlow_twins_pair_loss  # noqa: F401
