"""Mesh / distributed utility tests."""
import jax
import numpy as np

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.parallel import (
    batch_sharding,
    get_mesh,
    init_distributed,
    replicated,
    shard_batch,
)


class TestMesh:
    def test_mesh_sizes(self):
        assert get_mesh(0).devices.size == 8
        assert get_mesh(4).devices.size == 4
        assert get_mesh(8).axis_names == ("data",)

    def test_shard_batch_device_set(self):
        mesh = get_mesh(8)
        x = np.zeros((16, 4), np.float32)
        arr = shard_batch(x, mesh)
        assert len(arr.sharding.device_set) == 8
        # replicated sharding covers all devices with the full array
        sh = replicated(mesh)
        y = jax.device_put(np.zeros((3,)), sh)
        assert len(y.sharding.device_set) == 8

    def test_shard_batch_none_mesh(self):
        arr = shard_batch(np.zeros((4,)), None)
        assert np.asarray(arr).shape == (4,)

    def test_batch_sharding_spec(self):
        mesh = get_mesh(8)
        s = batch_sharding(mesh)
        assert s.spec[0] == "data"


class TestInitDistributed:
    def test_noop_without_flag(self):
        cfg = default_config(distributed=False)
        init_distributed(cfg)  # must not raise or initialize anything
        assert jax.process_count() == 1
