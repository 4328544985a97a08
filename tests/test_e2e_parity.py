"""End-to-end Barlow-Twins loss parity vs the reference torch implementation:
identical encoder weights (via the importer), identical projector weights
(manually mapped), identical inputs for the two views -> the scalar training
loss must match.  This is the strongest single parity statement: inputs
through AudioNTT + BarlowTwinsHead + BarlowTwinsLoss (reference model.py +
utils/loss.py) against our full stack.

Encoders run in eval-BN mode on both sides (deterministic: no dropout, fresh
running stats); the projector BN and the loss BN run in training mode (batch
statistics) on both sides, exactly as during pretraining."""
import types

import numpy as np
import pytest
import torch

from tests.torch_shims import import_reference

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ssl_audio_tpu.models.audiontt import AudioNTT2022  # noqa: E402
from ssl_audio_tpu.models.heads import BarlowTwinsHead  # noqa: E402
from ssl_audio_tpu.objectives.barlow import barlow_twins_pair_loss  # noqa: E402
from ssl_audio_tpu.utils import torch_import  # noqa: E402


@pytest.mark.parametrize("hsic", [False, True])
def test_full_bt_loss_parity(tmp_path, hsic):
    rng = np.random.default_rng(3)
    B, H, OUT = 16, 128, 32
    x1 = rng.standard_normal((B, 1, 64, 96)).astype(np.float32)
    x2 = rng.standard_normal((B, 1, 64, 96)).astype(np.float32)

    # ---- reference stack -------------------------------------------------
    ref_model_mod = import_reference("model")
    ref_loss_mod = import_reference("utils.loss")
    torch.manual_seed(0)
    enc_t = ref_model_mod.AudioNTT2022()
    cfg_t = types.SimpleNamespace(
        projector_n_hidden_layers=1, projector_hidden_dim=H,
        projector_out_dim=OUT, HSIC=hsic, alpha=1.0, lmbda=0.005,
    )
    head_t = ref_model_mod.BarlowTwinsHead(cfg_t, in_dim=3072)
    loss_t = ref_loss_mod.BarlowTwinsLoss(cfg_t, ncrops=2)
    enc_t.eval()      # deterministic encoder (no dropout, init running stats)
    head_t.train()    # projector BN on batch statistics, as in training
    loss_t.train()    # loss BN on batch statistics
    with torch.no_grad():
        z1 = head_t.projector(enc_t(torch.from_numpy(x1)))
        z2 = head_t.projector(enc_t(torch.from_numpy(x2)))
        ref_total = float(loss_t.forward_loss(z1, z2))

    # ---- our stack with the SAME weights ---------------------------------
    path = str(tmp_path / "enc.pth")
    torch.save(enc_t.state_dict(), path)
    enc_j = AudioNTT2022()
    variables = enc_j.init({"params": jax.random.key(0)},
                           jnp.asarray(x1), train=False)
    conv = torch_import.load_torch_audiontt_variables(
        path, {"params": {"encoder": variables["params"]["encoder"]},
               "batch_stats": {"encoder": variables["batch_stats"]["encoder"]}},
    )
    enc_vars = {"params": {"encoder": conv["params"]["encoder"]},
                "batch_stats": {"encoder": conv["batch_stats"]["encoder"]}}

    head_j = BarlowTwinsHead(projector_n_hidden_layers=1,
                             projector_hidden_dim=H, projector_out_dim=OUT)
    hv = head_j.init({"params": jax.random.key(1)},
                     jnp.zeros((2, 3072)), train=False)
    hp = jax.tree.map(np.asarray, hv["params"])
    # map torch projector -> flax head (Linear kernels transposed; BN affine)
    sd = head_t.state_dict()
    hp["Dense_0"]["kernel"] = sd["projector.0.weight"].numpy().T
    hp["BatchNorm_0"]["scale"] = sd["projector.1.weight"].numpy()
    hp["BatchNorm_0"]["bias"] = sd["projector.1.bias"].numpy()
    hp["Dense_1"]["kernel"] = sd["projector.3.weight"].numpy().T

    feats1 = enc_j.apply(enc_vars, jnp.asarray(x1), train=False)
    feats2 = enc_j.apply(enc_vars, jnp.asarray(x2), train=False)
    z1j = head_j.apply({"params": hp}, feats1, train=True,
                       mutable=["batch_stats"])[0]
    z2j = head_j.apply({"params": hp}, feats2, train=True,
                       mutable=["batch_stats"])[0]
    ours = float(barlow_twins_pair_loss(
        z1j, z2j, lmbda=0.005, alpha=1.0, HSIC=hsic
    ))
    # measured agreement is ~1.2e-6 relative (COVERAGE.md); assert at 1e-5 to
    # leave only noise headroom, not regression headroom
    np.testing.assert_allclose(ours, ref_total, rtol=1e-5)
