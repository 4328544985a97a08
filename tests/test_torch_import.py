"""Checkpoint-interop parity: instantiate the REFERENCE torch models (via the
timm shim), export their random-init state dicts, convert to Flax with
ssl_audio_tpu.utils.torch_import, and compare forward outputs <= 1e-4."""
import numpy as np
import pytest
import torch

from tests.torch_shims import import_reference

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ssl_audio_tpu.models import audiontt as ntt_lib  # noqa: E402
from ssl_audio_tpu.models import resnet as resnet_lib  # noqa: E402
from ssl_audio_tpu.models import vit as vit_lib  # noqa: E402
from ssl_audio_tpu.utils import torch_import  # noqa: E402


def save_sd(tmp_path, model, name):
    path = str(tmp_path / f"{name}.pth")
    torch.save(model.state_dict(), path)
    return path


@pytest.fixture(scope="module")
def x_np(rng=None):
    return np.random.default_rng(7).standard_normal((2, 1, 64, 96)).astype(np.float32)


class TestViTImport:
    @pytest.mark.parametrize("conv_stem", [False, True])
    def test_vit_tiny_output_parity(self, tmp_path, x_np, conv_stem):
        ref_mae = import_reference("models.mae")

        torch.manual_seed(0)
        ref = ref_mae.get_mae_vit("tiny", [16, 16], conv_stem)
        ref.eval()
        path = save_sd(tmp_path, ref, f"vit{conv_stem}")

        ours = vit_lib.get_mae_vit("tiny", [16, 16], conv_stem)
        variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x_np), train=False)
        if conv_stem:
            params, batch_stats = torch_import.load_torch_vit_params(
                path, variables["params"], variables.get("batch_stats")
            )
            out = ours.apply({"params": params, "batch_stats": batch_stats},
                             jnp.asarray(x_np), train=False)
        else:
            params = torch_import.load_torch_vit_params(path, variables["params"])
            out = ours.apply({"params": params}, jnp.asarray(x_np), train=False)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)

    def test_vit_mean_pool_parity(self, tmp_path, x_np):
        ref_mae = import_reference("models.mae")

        torch.manual_seed(1)
        ref = ref_mae.get_mae_vit("tiny", [16, 16], False)
        ref.eval()
        path = save_sd(tmp_path, ref, "vit_mp")
        ours = vit_lib.get_mae_vit("tiny", [16, 16], False)
        variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x_np), train=False)
        params = torch_import.load_torch_vit_params(path, variables["params"])
        out = ours.apply({"params": params}, jnp.asarray(x_np), train=False, mean_pool=True)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np), mean_pool=True).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)


class TestAudioNTTImport:
    @pytest.mark.parametrize("se", [False, True])
    def test_output_parity(self, tmp_path, x_np, se):
        ref_model_mod = import_reference("model")

        torch.manual_seed(0)
        ref = ref_model_mod.AudioNTT2022(squeeze_excitation=se)
        ref.eval()
        path = save_sd(tmp_path, ref, f"ntt{se}")

        ours = ntt_lib.AudioNTT2022(squeeze_excitation=se)
        variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x_np), train=False)
        conv = torch_import.load_torch_audiontt_variables(
            path, {"params": {"encoder": variables["params"]["encoder"]},
                   "batch_stats": {"encoder": variables["batch_stats"]["encoder"]}},
            squeeze_excitation=se,
        )
        out = ours.apply(
            {"params": {"encoder": conv["params"]["encoder"]},
             "batch_stats": {"encoder": conv["batch_stats"]["encoder"]}},
            jnp.asarray(x_np), train=False,
        )
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)


class TestResNetImport:
    @pytest.mark.parametrize(
        "name,ref_factory,our_factory",
        [
            ("resnet18", "resnet18", resnet_lib.resnet18),
            ("resnet18_ReGP_NRF", "resnet18_ReGP_NRF", resnet_lib.resnet18_ReGP_NRF),
            ("resnet50", "resnet50", resnet_lib.resnet50),
        ],
    )
    def test_output_parity(self, tmp_path, x_np, name, ref_factory, our_factory):
        ref_resnet = import_reference("models.resnet")

        torch.manual_seed(0)
        ref = getattr(ref_resnet, ref_factory)()
        ref.fc = torch.nn.Identity()
        ref.eval()
        path = save_sd(tmp_path, ref, name)

        ours = our_factory()
        variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x_np), train=False)
        conv = torch_import.load_torch_resnet_variables(path, variables, name)
        out = ours.apply(conv, jnp.asarray(x_np), train=False)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-3, rtol=1e-3)


class TestFlagshipHearShape:
    def test_vitc_small_16x8_import_parity(self, tmp_path, x_np):
        """The paper's flagship HEAR ViT shape: conv-stem, patch 16x8."""
        ref_mae = import_reference("models.mae")

        torch.manual_seed(2)
        ref = ref_mae.get_mae_vit("small", [16, 8], True)
        ref.eval()
        path = save_sd(tmp_path, ref, "vitc_small_16x8")

        ours = vit_lib.get_mae_vit("small", [16, 8], True)
        variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x_np), train=False)
        params, batch_stats = torch_import.load_torch_vit_params(
            path, variables["params"], variables["batch_stats"]
        )
        out = ours.apply({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(x_np), train=False)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)


class TestPosEmbedInterpolationOnImport:
    def test_square_grid_matches_reference(self):
        """interpolate_pos_embed value parity against the reference's own
        implementation (models/pos_embed.py:71-92) on its square-grid case."""
        import types

        ref_pe = import_reference("models.pos_embed")
        rng = np.random.default_rng(11)
        D = 32
        pe = rng.standard_normal((1, 1 + 16, D)).astype(np.float32)  # 4x4 + cls

        ckpt = {"pos_embed": torch.from_numpy(pe.copy())}
        model = types.SimpleNamespace(
            patch_embed=types.SimpleNamespace(num_patches=36),
            pos_embed=torch.zeros(1, 37, D),
        )
        ref_pe.interpolate_pos_embed(model, ckpt)
        ref = ckpt["pos_embed"].numpy()

        ours = torch_import.interpolate_pos_embed(pe, target_len=37)
        assert ours.shape == (1, 37, D)
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)

    def test_rectangular_grid_and_cls_preserved(self):
        rng = np.random.default_rng(12)
        D = 16
        pe = rng.standard_normal((1, 1 + 4 * 6, D)).astype(np.float32)
        out = torch_import.interpolate_pos_embed(
            pe, target_len=1 + 8 * 12, ckpt_grid=(4, 6), target_grid=(8, 12)
        )
        assert out.shape == (1, 1 + 96, D)
        np.testing.assert_array_equal(out[:, 0], pe[:, 0])  # cls unchanged

    def test_loader_interpolates_on_grid_mismatch(self, tmp_path):
        """A checkpoint trained at one time-resolution imports into a model
        built for another (reference usage: linear.py loads 64x96-grid
        checkpoints into arbitrary-length eval models)."""
        ref_mae = import_reference("models.mae")
        torch.manual_seed(3)
        ref = ref_mae.get_mae_vit("tiny", [16, 16], False)
        path = save_sd(tmp_path, ref, "vit_grid_src")

        ours = vit_lib.get_mae_vit("tiny", [16, 16], False, img_size=(64, 208),
                                   use_learned_pos_embd=True)
        x = np.random.default_rng(5).standard_normal((2, 1, 64, 208)).astype(np.float32)
        variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
        params = torch_import.load_torch_vit_params(
            path, variables["params"], ckpt_grid=(4, 6), target_grid=(4, 13)
        )
        out = ours.apply({"params": params}, jnp.asarray(x), train=False)
        assert np.isfinite(np.asarray(out)).all()
