from ssl_audio_tpu.eval.mlp_clf import MLPClassifier  # noqa: F401
