"""Checkpoint-interop, export direction: convert OUR random-init Flax params
to reference-layout .pth state dicts (ssl_audio_tpu.utils.torch_export),
`load_state_dict(strict=True)` them into the REFERENCE torch models, and
compare forward outputs <= 1e-4 — the inverse of test_torch_import, proving
TPU-trained weights run in the reference's own torch pipelines."""
import numpy as np
import pytest
import torch

from tests.torch_shims import import_reference

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ssl_audio_tpu.models import audiontt as ntt_lib  # noqa: E402
from ssl_audio_tpu.models import resnet as resnet_lib  # noqa: E402
from ssl_audio_tpu.models import vit as vit_lib  # noqa: E402
from ssl_audio_tpu.utils import torch_export  # noqa: E402


@pytest.fixture(scope="module")
def x_np():
    return np.random.default_rng(7).standard_normal((2, 1, 64, 96)).astype(np.float32)


def perturb_stats(batch_stats, seed=3):
    """Random running stats so the export path is exercised beyond the
    trivial mean-0/var-1 init (var kept positive)."""
    rng = np.random.default_rng(seed)
    # tree_map can't see key names; perturb mean/var differently via paths
    import jax as _jax

    flat = _jax.tree_util.tree_flatten_with_path(batch_stats)[0]
    out = batch_stats
    for path, leaf in flat:
        keyname = str(path[-1])
        val = rng.standard_normal(np.shape(leaf)).astype(np.float32)
        if "var" in keyname:
            val = 0.5 + np.abs(val)
        node = out
        for k in path[:-1]:
            node = node[k.key]
        node[path[-1].key] = val
    return out


class TestViTExport:
    @pytest.mark.parametrize("conv_stem", [False, True])
    def test_output_parity(self, x_np, conv_stem):
        ref_mae = import_reference("models.mae")

        ours = vit_lib.get_mae_vit("tiny", [16, 16], conv_stem)
        variables = dict(ours.init({"params": jax.random.key(1)},
                                   jnp.asarray(x_np), train=False))
        variables = {k: jax.tree.map(np.asarray, v) for k, v in variables.items()}
        if conv_stem:
            variables["batch_stats"] = perturb_stats(variables["batch_stats"])
        sd = torch_export.export_vit_state_dict(
            ours, variables["params"], variables.get("batch_stats"))

        torch.manual_seed(0)
        ref = ref_mae.get_mae_vit("tiny", [16, 16], conv_stem)
        ref.load_state_dict(sd, strict=True)
        ref.eval()

        out = ours.apply(variables, jnp.asarray(x_np), train=False)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)

    def test_flagship_hear_shape(self, x_np):
        """vitc small 16x8 — the paper's flagship HEAR shape, exported."""
        ref_mae = import_reference("models.mae")

        ours = vit_lib.get_mae_vit("small", [16, 8], True)
        variables = dict(ours.init({"params": jax.random.key(2)},
                                   jnp.asarray(x_np), train=False))
        variables = {k: jax.tree.map(np.asarray, v) for k, v in variables.items()}
        variables["batch_stats"] = perturb_stats(variables["batch_stats"], seed=5)
        sd = torch_export.export_vit_state_dict(
            ours, variables["params"], variables["batch_stats"])
        ref = ref_mae.get_mae_vit("small", [16, 8], True)
        ref.load_state_dict(sd, strict=True)
        ref.eval()
        out = ours.apply(variables, jnp.asarray(x_np), train=False)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)


class TestAudioNTTExport:
    @pytest.mark.parametrize("se", [False, True])
    def test_output_parity(self, x_np, se):
        ref_model_mod = import_reference("model")

        ours = ntt_lib.AudioNTT2022(squeeze_excitation=se)
        variables = dict(ours.init({"params": jax.random.key(1),
                                    "dropout": jax.random.key(2)},
                                   jnp.asarray(x_np), train=False))
        variables = {k: jax.tree.map(np.asarray, v) for k, v in variables.items()}
        variables["batch_stats"] = perturb_stats(variables["batch_stats"])
        sd = torch_export.export_audiontt_state_dict(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            squeeze_excitation=se)

        torch.manual_seed(0)
        ref = ref_model_mod.AudioNTT2022(squeeze_excitation=se)
        ref.load_state_dict(sd, strict=True)
        ref.eval()
        out = ours.apply(variables, jnp.asarray(x_np), train=False)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4, rtol=1e-4)


class TestResNetExport:
    @pytest.mark.parametrize(
        "name,ref_factory,our_factory",
        [
            ("resnet18", "resnet18", resnet_lib.resnet18),
            ("resnet18_ReGP_NRF", "resnet18_ReGP_NRF", resnet_lib.resnet18_ReGP_NRF),
            ("resnet50", "resnet50", resnet_lib.resnet50),
        ],
    )
    def test_output_parity(self, x_np, name, ref_factory, our_factory):
        ref_resnet = import_reference("models.resnet")

        ours = our_factory()
        variables = dict(ours.init({"params": jax.random.key(1)},
                                   jnp.asarray(x_np), train=False))
        variables = {k: jax.tree.map(np.asarray, v) for k, v in variables.items()}
        variables["batch_stats"] = perturb_stats(variables["batch_stats"])
        sd = torch_export.export_resnet_state_dict(variables, name)

        torch.manual_seed(0)
        ref = getattr(ref_resnet, ref_factory)()
        ref.fc = torch.nn.Identity()
        ref.load_state_dict(sd, strict=True)
        ref.eval()
        out = ours.apply(variables, jnp.asarray(x_np), train=False)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-3, rtol=1e-3)


class TestCliRoundtrip:
    def test_pth_orbax_pth(self, tmp_path, x_np):
        """Reference .pth -> import CLI -> Orbax -> export CLI -> .pth:
        the re-exported state dict strict-loads and reproduces the original
        torch model's outputs."""
        ref_model_mod = import_reference("model")
        from tools import export_torch_ckpt, import_torch_ckpt

        torch.manual_seed(0)
        ref = ref_model_mod.AudioNTT2022()
        ref.eval()
        pth = str(tmp_path / "orig.pth")
        torch.save(ref.state_dict(), pth)

        orbax_dir = str(tmp_path / "orbax")
        import_torch_ckpt.main(["--model_type", "audiontt", "--pth", pth,
                                "--out", orbax_dir])
        pth2 = str(tmp_path / "roundtrip.pth")
        export_torch_ckpt.main(["--model_type", "audiontt",
                                "--ckpt", orbax_dir, "--out", pth2])

        ref2 = ref_model_mod.AudioNTT2022()
        ref2.load_state_dict(torch.load(pth2, weights_only=False), strict=True)
        ref2.eval()
        with torch.no_grad():
            a = ref(torch.from_numpy(x_np)).numpy()
            b = ref2(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)

    def test_pth_orbax_pth_squeeze_excitation(self, tmp_path, x_np):
        """SE-variant AudioNTT roundtrips through both CLIs without flags:
        SE is inferred from the .pth keys on import and from the SEBlock_*
        params on export (ADVICE r3: cfg.squeeze_excitation default dropped
        SE weights)."""
        ref_model_mod = import_reference("model")
        from tools import export_torch_ckpt, import_torch_ckpt

        torch.manual_seed(0)
        ref = ref_model_mod.AudioNTT2022(squeeze_excitation=True)
        ref.eval()
        pth = str(tmp_path / "orig_se.pth")
        torch.save(ref.state_dict(), pth)

        orbax_dir = str(tmp_path / "orbax_se")
        import_torch_ckpt.main(["--model_type", "audiontt", "--pth", pth,
                                "--out", orbax_dir])
        pth2 = str(tmp_path / "roundtrip_se.pth")
        export_torch_ckpt.main(["--model_type", "audiontt",
                                "--ckpt", orbax_dir, "--out", pth2])

        ref2 = ref_model_mod.AudioNTT2022(squeeze_excitation=True)
        ref2.load_state_dict(torch.load(pth2, weights_only=False), strict=True)
        ref2.eval()
        with torch.no_grad():
            a = ref(torch.from_numpy(x_np)).numpy()
            b = ref2(torch.from_numpy(x_np)).numpy()
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)
