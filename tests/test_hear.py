"""HEAR API surface tests: contract shapes, frame_audio parity with the
reference implementation, and torch-tensor round-tripping."""
import numpy as np
import pytest
import torch

import hear.sample.conv as hear_conv
import hear.sample.vit as hear_vit
from ssl_audio_tpu.hear import utils as hutils


class TestFrameAudio:
    def ref_frame_audio(self, audio, frame_size, hop_size, sample_rate):
        """Direct port of reference hear/utils.py:56-105 (torch)."""
        import torch.nn.functional as F

        audio = torch.from_numpy(audio)
        audio = F.pad(audio, (frame_size // 2, frame_size - frame_size // 2))
        num_padded = audio.shape[1]
        frame_step = hop_size / 1000.0 * sample_rate
        frames, timestamps = [], []
        frame_number = 0
        frame_start, frame_end = 0, frame_size
        while True:
            frames.append(audio[:, frame_start:frame_end])
            timestamps.append(frame_number * frame_step / sample_rate * 1000.0)
            frame_number += 1
            frame_start = int(round(frame_number * frame_step))
            frame_end = frame_start + frame_size
            if not frame_end <= num_padded:
                break
        ts = torch.tensor(timestamps, dtype=torch.float32).expand(audio.shape[0], -1)
        return torch.stack(frames, dim=1).numpy(), ts.numpy()

    def test_parity(self, rng):
        audio = rng.standard_normal((3, 32000)).astype(np.float32)
        ours_f, ours_t = hutils.frame_audio(audio, 15200, 50, 16000)
        ref_f, ref_t = self.ref_frame_audio(audio, 15200, 50, 16000)
        np.testing.assert_array_equal(ours_f, ref_f)
        np.testing.assert_allclose(ours_t, ref_t, atol=1e-4)

    def test_short_audio(self, rng):
        audio = rng.standard_normal((1, 8000)).astype(np.float32)
        f, t = hutils.frame_audio(audio, 15200, 50, 16000)
        rf, rt = self.ref_frame_audio(audio, 15200, 50, 16000)
        assert f.shape == rf.shape


class TestTimestampStats:
    def test_reference_bug_replicated(self, rng):
        mel = rng.standard_normal((10, 64, 96)).astype(np.float32)
        mean, std = hutils.compute_timestamp_stats(mel)
        np.testing.assert_allclose(mean, mel.mean() / 10, rtol=1e-5)
        np.testing.assert_allclose(std, mel.std() / 10, rtol=1e-5)


@pytest.fixture(scope="module")
def vit_model():
    return hear_vit.load_model("", "vit_tiny", "16x16")


@pytest.fixture(scope="module")
def conv_model():
    return hear_conv.load_model("", "audiontt")


class TestViTAPI:
    def test_metadata(self, vit_model):
        assert vit_model.sample_rate == 16000
        assert vit_model.scene_embedding_size == 192
        assert vit_model.timestamp_embedding_size == 192 * 4

    def test_scene_embeddings(self, vit_model, rng):
        audio = torch.from_numpy(rng.standard_normal((2, 32000)).astype(np.float32))
        emb = hear_vit.get_scene_embeddings(audio, vit_model)
        assert isinstance(emb, torch.Tensor)
        assert emb.shape == (2, 192)
        assert torch.isfinite(emb).all()

    def test_timestamp_embeddings(self, vit_model, rng):
        audio = torch.from_numpy(rng.standard_normal((2, 32000)).astype(np.float32))
        emb, ts = hear_vit.get_timestamp_embeddings(audio, vit_model)
        assert isinstance(emb, torch.Tensor) and isinstance(ts, torch.Tensor)
        assert emb.shape[0] == 2 and emb.shape[2] == 192
        assert ts.shape == emb.shape[:2]
        # timestamps every 50 ms starting at 0
        np.testing.assert_allclose(np.diff(ts[0].numpy()), 50.0, atol=1e-3)

    def test_bf16_compute_close_to_fp32(self, vit_model, rng):
        """compute_dtype='bfloat16' (bf16 encoder forward; params cast at
        load, pos-embed adds dtype-preserving, softmax in f32 —
        models/vit.py) returns float32 embeddings within bf16 activation
        rounding of the fp32 path, for both API calls."""
        import jax
        import jax.numpy as jnp

        audio = torch.from_numpy(
            rng.standard_normal((2, 32000)).astype(np.float32))
        bf = hear_vit.load_model("", "vit_tiny", "16x16",
                                 compute_dtype="bfloat16")
        # share weights: cast only the params collection, the way load does
        bf.variables = dict(
            vit_model.variables,
            params=jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
                vit_model.variables["params"]))
        bf.params = bf.variables["params"]
        ref, _ = hear_vit.get_timestamp_embeddings(audio, vit_model)
        emb, _ = hear_vit.get_timestamp_embeddings(audio, bf)
        assert emb.dtype == torch.float32
        scale = ref.abs().max().item()
        assert (emb - ref).abs().max().item() <= 0.05 * scale
        sref = hear_vit.get_scene_embeddings(audio, vit_model)
        semb = hear_vit.get_scene_embeddings(audio, bf)
        assert (semb - sref).abs().max().item() <= 0.05 * sref.abs().max().item()


class TestConvAPI:
    def test_metadata(self, conv_model):
        assert conv_model.scene_embedding_size == 3072
        assert conv_model.timestamp_embedding_size == 3072

    def test_scene_embeddings(self, conv_model, rng):
        audio = torch.from_numpy(rng.standard_normal((2, 24000)).astype(np.float32))
        emb = hear_conv.get_scene_embeddings(audio, conv_model)
        assert emb.shape == (2, 3072)
        assert torch.isfinite(emb).all()

    def test_timestamp_embeddings(self, conv_model, rng):
        audio = torch.from_numpy(rng.standard_normal((1, 24000)).astype(np.float32))
        emb, ts = hear_conv.get_timestamp_embeddings(audio, conv_model)
        assert emb.shape[0] == 1 and emb.shape[2] == 3072
        assert ts.shape == emb.shape[:2]

    def test_bf16_fetch_close_to_fp32(self, conv_model, rng):
        """fetch_dtype='bfloat16' (halves the device->host embedding
        transfer) must return float32 tensors within bf16 rounding of the
        default path."""
        audio = torch.from_numpy(rng.standard_normal((1, 24000)).astype(np.float32))
        ref, _ = hear_conv.get_timestamp_embeddings(audio, conv_model)
        fast = hear_conv.load_model("", "audiontt", fetch_dtype="bfloat16")
        fast.variables = conv_model.variables          # share weights
        emb, _ = hear_conv.get_timestamp_embeddings(audio, fast)
        assert emb.dtype == torch.float32
        scale = ref.abs().max().item()
        assert (emb - ref).abs().max().item() <= 2 ** -7 * scale

    def test_bf16_compute_close_to_fp32(self, conv_model, rng):
        """compute_dtype='bfloat16' (bf16 encoder forward — the HBM-bound
        serving option) returns float32 embeddings within bf16 activation
        rounding of the fp32 path, for both API calls."""
        audio = torch.from_numpy(
            rng.standard_normal((2, 24000)).astype(np.float32))
        bf = hear_conv.load_model("", "audiontt", compute_dtype="bfloat16")
        # share weights: re-cast the fp32 model's tree the way load does
        import jax
        import jax.numpy as jnp

        bf.variables = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
            conv_model.variables)
        ref, _ = hear_conv.get_timestamp_embeddings(audio, conv_model)
        emb, _ = hear_conv.get_timestamp_embeddings(audio, bf)
        assert emb.dtype == torch.float32
        scale = ref.abs().max().item()
        assert (emb - ref).abs().max().item() <= 0.05 * scale
        sref = hear_conv.get_scene_embeddings(audio, conv_model)
        semb = hear_conv.get_scene_embeddings(audio, bf)
        assert (semb - sref).abs().max().item() <= 0.05 * sref.abs().max().item()


class TestCheckpointLoading:
    def test_load_from_orbax_train_ckpt(self, tmp_path, rng):
        """A main.py checkpoint loads into the HEAR wrapper."""
        import jax

        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.utils import checkpoint as ckpt_lib

        cfg = default_config(model_type="vit_tiny", batch_size=4,
                             projector_hidden_dim=32, projector_out_dim=8)
        mods, state = init_train_state(cfg, jax.random.key(5))
        path = str(tmp_path / "ck")
        ckpt_lib.save_checkpoint(path, jax.device_get(state), epoch=1)

        model = hear_vit.load_model(path, "vit_tiny", "16x16")
        ref = jax.tree.leaves(jax.device_get(state.params["encoder"]))[0]
        got = jax.tree.leaves(model.params)[0]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestDeviceFraming:
    def test_matches_host_frame_audio(self, rng):
        """_frame_audio_on_device == host frame_audio windows + timestamps."""
        import numpy as np

        from ssl_audio_tpu.hear.vit import BATCH_SIZE, _frame_audio_on_device

        audio = rng.standard_normal((3, 32000)).astype(np.float32)
        host_f, host_t = hutils.frame_audio(audio, 15200, 50, 16000)
        flat, ts, N = _frame_audio_on_device(audio, 15200, 50, 16000)
        assert N == host_f.shape[0] * host_f.shape[1]
        np.testing.assert_array_equal(
            np.asarray(flat)[:N], host_f.reshape(N, -1)
        )
        np.testing.assert_allclose(ts.numpy(), host_t, atol=1e-4)
        assert flat.shape[0] % BATCH_SIZE == 0
