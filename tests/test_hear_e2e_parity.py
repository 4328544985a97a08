"""End-to-end HEAR embedding parity: the COMPOSED get_scene_embeddings /
get_timestamp_embeddings outputs of our JAX stack against the reference torch
pipeline (hear/sample/vit.py:157-247, conv.py:102-217) running with SHARED
random-init weights.  The reference modules are imported as-is (via the
torchaudio/easydict shims in torch_shims); the only substituted component is
torchaudio's MelSpectrogram, rebuilt from its documented algorithm and itself
parity-tested in test_mel.py."""
import numpy as np
import pytest
import torch

from tests.torch_shims import import_reference_hear

import hear.sample.conv as our_conv  # noqa: E402
import hear.sample.vit as our_vit  # noqa: E402

REF_CFG = "/root/reference/hear/config.yaml"


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(42)
    return torch.from_numpy(
        (0.3 * rng.standard_normal((2, 32000))).astype(np.float32)
    )


@pytest.fixture(scope="module")
def vit_pair(tmp_path_factory):
    """(reference module, reference model, our model) with shared weights."""
    ref_vit = import_reference_hear("hear.sample.vit")
    torch.manual_seed(7)
    ref_model = ref_vit.load_model("", "vit_tiny", "16x16", cfg_path=REF_CFG)
    path = str(tmp_path_factory.mktemp("hear") / "vit.pth")
    torch.save(ref_model.model.state_dict(), path)
    our_model = our_vit.load_model(path, "vit_tiny", "16x16")
    return ref_vit, ref_model, our_model


@pytest.fixture(scope="module")
def conv_pair(tmp_path_factory):
    ref_conv = import_reference_hear("hear.sample.conv")
    torch.manual_seed(8)
    ref_model = ref_conv.load_model("", "audiontt", cfg_path=REF_CFG)
    ref_model.eval()
    path = str(tmp_path_factory.mktemp("hear") / "conv.pth")
    torch.save(ref_model.model.state_dict(), path)
    our_model = our_conv.load_model(path, "audiontt")
    return ref_conv, ref_model, our_model


class TestViTEndToEnd:
    def test_scene_embeddings_value_parity(self, vit_pair, audio):
        ref_vit, ref_model, our_model = vit_pair
        ref = ref_vit.get_scene_embeddings(audio, ref_model).numpy()
        ours = our_vit.get_scene_embeddings(audio, our_model).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_timestamp_embeddings_value_parity(self, vit_pair, audio):
        ref_vit, ref_model, our_model = vit_pair
        ref_e, ref_t = ref_vit.get_timestamp_embeddings(
            audio, ref_model, cfg_path=REF_CFG
        )
        our_e, our_t = our_vit.get_timestamp_embeddings(audio, our_model)
        assert our_e.shape == ref_e.shape
        np.testing.assert_allclose(our_t.numpy(), ref_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            our_e.numpy(), ref_e.numpy(), atol=1e-4, rtol=1e-3
        )


class TestConvEndToEnd:
    def test_scene_embeddings_value_parity(self, conv_pair, audio):
        ref_conv, ref_model, our_model = conv_pair
        with torch.no_grad():
            ref = ref_conv.get_scene_embeddings(
                list(audio), ref_model, cfg_path=REF_CFG
            ).numpy()
        ours = our_conv.get_scene_embeddings(audio, our_model).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_timestamp_embeddings_value_parity(self, conv_pair, audio):
        ref_conv, ref_model, our_model = conv_pair
        ref_e, ref_t = ref_conv.get_timestamp_embeddings(
            audio, ref_model, cfg_path=REF_CFG
        )
        our_e, our_t = our_conv.get_timestamp_embeddings(audio, our_model)
        assert our_e.shape == ref_e.shape
        np.testing.assert_allclose(our_t.numpy(), ref_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(
            our_e.numpy(), ref_e.detach().numpy(), atol=1e-4, rtol=1e-3
        )
