"""--steps_per_dispatch: the scanned N-step dispatch must reproduce the
step-by-step loop's math exactly (same keys, same batch order, same carried
augmentation/monitor state — only the dispatch grouping changes)."""
import jax
import numpy as np
import pytest

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.data.datasets import SyntheticLMS
from ssl_audio_tpu.train.loop import Trainer


def _run_epoch(spd, model_type="audiontt", steps=6, mask=False):
    cfg = default_config(
        model_type=model_type, dataset="synthetic", batch_size=8,
        synthetic_steps_per_epoch=steps, epochs=1, no_eval=True,
        steps_per_dispatch=spd, num_workers=2,
        projector_hidden_dim=32, projector_out_dim=8,
        mask=mask, mask_ratio=0.25 if mask else 0.0,
    )
    ds = SyntheticLMS(cfg, length=steps * 8, n_classes=4, seed=5)
    tr = Trainer(cfg, dataset=ds)
    return tr.train_one_epoch(1)


class TestStepsPerDispatch:
    # tolerance: the scanned and unscanned compilations of the same step
    # fuse/reassociate fp32 reductions differently; measured drift is
    # ~1e-4 relative on the ~80-magnitude BT loss after 6 steps
    def test_matches_single_step_loop(self):
        l1 = _run_epoch(1)
        l3 = _run_epoch(3)
        np.testing.assert_allclose(l1, l3, rtol=1e-3)

    def test_tail_window(self):
        # 6 steps with spd=4 -> one full window + a 2-step tail
        l1 = _run_epoch(1)
        l4 = _run_epoch(4)
        np.testing.assert_allclose(l1, l4, rtol=1e-3)

    def test_masked_vit_multi_dispatch(self):
        loss = _run_epoch(2, model_type="vit_tiny", steps=4, mask=True)
        assert np.isfinite(loss)

    def test_mask_schedule_with_token_drop(self):
        """mask_ratio_schedule + token_drop: len_keep re-quantizes as the
        sine schedule moves (each distinct value compiles once)."""
        cfg = default_config(
            model_type="vit_tiny", dataset="synthetic", batch_size=8,
            synthetic_steps_per_epoch=4, epochs=2, no_eval=True,
            num_workers=2, mask=True, mask_ratio_schedule=True, mask_beta=0.3,
            projector_hidden_dim=32, projector_out_dim=8,
        )
        ds = SyntheticLMS(cfg, length=32, n_classes=4, seed=5)
        tr = Trainer(cfg, dataset=ds)
        for ep in (1, 2):
            loss = tr.train_one_epoch(ep)
            assert np.isfinite(loss)

    def test_byol_multi_dispatch(self):
        cfg = default_config(
            model_type="audiontt", dataset="synthetic", batch_size=8,
            synthetic_steps_per_epoch=4, epochs=1, no_eval=True,
            steps_per_dispatch=2, num_workers=2, stop_gradient=True,
            predictor=True, projector_hidden_dim=32, projector_out_dim=8,
        )
        ds = SyntheticLMS(cfg, length=32, n_classes=4, seed=5)
        tr = Trainer(cfg, dataset=ds, byol=True)
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss)
