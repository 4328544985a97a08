"""HEAR 2021 benchmark package — same import layout as the reference
(`hear.sample.vit` / `hear.sample.conv`) so the external heareval harness
runs unmodified; implementations live in ssl_audio_tpu.hear."""
