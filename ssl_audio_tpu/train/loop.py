"""Training driver: dataset selection, epoch loop, checkpoint/resume, logging
(reference main.py:37-171 and 350-520, rebuilt around one jitted step)."""
from __future__ import annotations

import os
import sys
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssl_audio_tpu.data import datasets as D
from ssl_audio_tpu.data.pipeline import DataLoader
from ssl_audio_tpu.parallel import get_mesh, replicated, shard_batch
from ssl_audio_tpu.train.state import init_train_state
from ssl_audio_tpu.train.steps import make_byol_train_step, make_train_step
from ssl_audio_tpu.utils import checkpoint as ckpt_lib
from ssl_audio_tpu.utils import schedules
from ssl_audio_tpu.utils.logging_utils import make_csv_logger


class _ConcatDataset:
    def __init__(self, parts):
        self.parts = parts
        self.offsets = np.cumsum([0] + [len(p) for p in parts])
        self.label_num = max(getattr(p, "label_num", 0) for p in parts)

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx):
        part = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.parts[part][idx - int(self.offsets[part])]


def get_train_dataset(cfg, data_dir="data"):
    """Reference get_data (main.py:257-311), minus host-side transforms."""
    ds = cfg.dataset
    if ds == "fsd50k":
        return D.FSD50K(cfg, split="train_val",
                        norm_stats=None if cfg.pre_norm else D.NORM_STATS["fsd50k"],
                        data_dir=data_dir, seed=cfg.seed)
    if ds == "librispeech":
        return D.LibriSpeech(cfg, norm_stats=D.NORM_STATS["librispeech"],
                             data_dir=data_dir, seed=cfg.seed)
    if ds == "fsd50k+librispeech":
        return _ConcatDataset([
            D.FSD50K(cfg, split="train_val", norm_stats=D.NORM_STATS["fsd50k"],
                     data_dir=data_dir, seed=cfg.seed),
            D.LibriSpeech(cfg, norm_stats=D.NORM_STATS["librispeech"],
                          data_dir=data_dir, seed=cfg.seed),
        ])
    if ds == "audioset":
        return D.AudioSet(cfg, norm_stats=D.NORM_STATS["audioset"],
                          data_dir=data_dir, seed=cfg.seed)
    if ds == "audioset+librispeech":
        return _ConcatDataset([
            D.AudioSet(cfg, norm_stats=D.NORM_STATS["audioset"],
                       data_dir=data_dir, seed=cfg.seed),
            D.LibriSpeech(cfg, norm_stats=D.NORM_STATS["librispeech"],
                          n_dummy=527, data_dir=data_dir, seed=cfg.seed),
        ])
    if ds == "audioset_wav":
        return D.AudioSetWav(
            cfg, base_dir=os.path.join(data_dir, "audioset"),
            balanced_only=cfg.audioset_balanced_only,
            twohundredk_only=cfg.audioset_200k_only, seed=cfg.seed,
        )
    if ds == "nsynth":
        return D.NSynthHEAR(cfg, split="train", norm_stats=D.NORM_STATS["nsynth"],
                            data_dir=data_dir, seed=cfg.seed)
    if ds == "synthetic":
        return D.SyntheticLMS(
            cfg, length=cfg.synthetic_steps_per_epoch * cfg.batch_size, seed=cfg.seed
        )
    if ds == "synthetic_multicue":
        return D.SyntheticMultiCue(
            cfg, length=cfg.synthetic_steps_per_epoch * cfg.batch_size, seed=cfg.seed
        )
    if ds == "synthetic_wav":
        return D.SyntheticWav(
            cfg, length=cfg.synthetic_steps_per_epoch * cfg.batch_size, seed=cfg.seed
        )
    if ds == "cifar10":
        from ssl_audio_tpu.data.cifar10 import Cifar10

        return Cifar10(data_dir, train=True)
    raise ValueError(f"Unsupported dataset {ds}")


def mask_ratio_for_step(cfg, schedule, iteration: int, rng: np.random.Generator,
                        byol: bool = False) -> float:
    """Reference main.py:72-81; the BYOL entry samples U(0.02, 0.2) instead
    (main_bt_byol.py:68-75) and has no schedule."""
    if not cfg.mask:
        return 0.0
    if schedule is not None and not byol:
        return float(schedule[min(iteration, len(schedule) - 1)])
    if cfg.random_mask_ratio:
        # r ~ U(lo, hi) with p=0.5 else 0 (utils.py:30-33)
        lo, hi = (0.02, 0.2) if byol else (0.05, cfg.mask_beta)
        if rng.random() > 0.5:
            return float(rng.uniform(lo, hi))
        return 0.0
    return float(cfg.mask_ratio)


class Trainer:
    def __init__(self, cfg, byol: bool = False, data_dir: str = "data",
                 log_dir: Optional[str] = None, wandb_run=None, dataset=None):
        self.cfg = cfg
        self.byol = byol
        self.data_dir = data_dir
        self.wandb_run = wandb_run

        self.dataset = dataset if dataset is not None else get_train_dataset(cfg, data_dir)
        # cfg.batch_size is the GLOBAL batch (the reference's --batch_size;
        # per-GPU = global/world at main.py:357): each process loads its
        # contiguous 1/process_count of every global batch and shard_batch
        # assembles the global array (parallel/mesh.py)
        n_proc = jax.process_count()
        if cfg.batch_size % n_proc:
            raise ValueError(
                f"--batch_size {cfg.batch_size} must divide across "
                f"{n_proc} processes")
        self.loader = DataLoader(
            self.dataset, cfg.batch_size // n_proc, shuffle=True,
            drop_last=True, num_workers=cfg.num_workers, seed=cfg.seed,
            process_index=jax.process_index(), process_count=n_proc,
        )
        self.niter_per_ep = len(self.loader)

        self.mesh = get_mesh(cfg.data_axis_size,
                             getattr(cfg, "model_parallel", 1))
        # world_scale reproduces the reference's world_size multiplier in the
        # BT loss (loss.py:21) = the number of BATCH shards — the data-axis
        # size, not the device count (model-parallel devices share a shard)
        n_dev = self.mesh.shape["data"]
        self.mods, self.state = init_train_state(
            cfg, jax.random.key(cfg.seed), niter_per_ep=self.niter_per_ep,
            byol=byol, mesh=self.mesh,
        )
        self.state = self._replicate(self.state)
        # Donation is the right default on real TPU deployments (frees input
        # buffers), but costs ~42 ms/call through the axon remote tunnel
        # (PERF.md) — disable it there.
        donate = os.environ.get("PALLAS_AXON_POOL_IPS") is None
        frontend = None
        if getattr(self.dataset, "returns_wav", False):
            # end-to-end mode: raw waveforms in, mel+crop on device
            from ssl_audio_tpu.train.steps import make_device_frontend

            stats = D.NORM_STATS.get(cfg.dataset.split("+")[0].split("_")[0],
                                     (0.0, 1.0))
            frontend = make_device_frontend(cfg, stats)
        step_factory = make_byol_train_step if byol else make_train_step
        self.train_step = step_factory(
            self.mods, world_scale=float(n_dev), frontend=frontend, donate=donate
        )
        self.multi_step = None
        if int(getattr(cfg, "steps_per_dispatch", 1)) > 1:
            from ssl_audio_tpu.train.steps import make_multi_train_step

            self.multi_step = make_multi_train_step(
                self.mods, int(cfg.steps_per_dispatch), world_scale=float(n_dev),
                frontend=frontend, donate=donate, byol=byol,
            )

        self.mask_schedule = None
        if cfg.mask_ratio_schedule:
            self.mask_schedule = schedules.sine_scheduler_increase(
                final_value=cfg.mask_beta,
                epochs=cfg.epochs,
                niter_per_ep=self.niter_per_ep,
                warmup_epochs=int(cfg.epochs / 5),
                warmup_value=0,
            )

        self.logger = make_csv_logger(log_dir) if log_dir else None
        self.host_rng = np.random.default_rng(cfg.seed + 17)
        self.rng_key = jax.random.key(cfg.seed + 1)

        # token-drop fast path: masked ViT forwards run on the reference's
        # own compute shape, 1 + int(L*(1-ratio)) tokens (vit.prepare_tokens).
        # len_keep is STATIC per compile; distinct values are bounded by L.
        self._token_L = None
        if self.mods.vit and cfg.mask and cfg.token_drop:
            gh, gw = self.mods.encoder.grid_size()
            self._token_L = gh * gw

    def _replicate(self, state):
        """Place the train state on the mesh: replicated for a 1-D data
        mesh; with --model_parallel the transformer Dense kernels (and their
        optimizer moments) are tensor-parallel-sharded over the 'model'
        axis; with --fsdp the remaining large leaves are ZeRO-3-sharded over
        'data' (parallel/mesh.py state_shardings)."""
        from ssl_audio_tpu.parallel import place_state

        return place_state(state, self.mesh,
                           fsdp=bool(getattr(self.cfg, "fsdp", False)))

    def _check_monitor(self, monitor) -> float:
        """Fetch the device-side monitor; abort on any NaN since the last
        fetch (reference main.py:128-130 checks every step — here the
        every-step isfinite is folded into the jitted step, so one fetch
        covers all steps since the previous one). Returns summed loss."""
        finite = bool(jax.device_get(monitor["finite"]))
        if not finite:
            print("Loss is not finite. Stopping training")
            sys.exit(1)
        return float(jax.device_get(monitor["loss_sum"]))

    def _fresh_monitor(self):
        """Epoch-start NaN monitor, COMMITTED to the mesh like a step
        output: an uncommitted scalar tree is a different jit cache
        signature than the committed monitor a step returns, which forced a
        full recompile at dispatch 2 and again at each epoch start
        (measured 3x ~75 s compiles of the same ViT-B program)."""
        from ssl_audio_tpu.train.steps import init_monitor

        return jax.device_put(
            init_monitor(),
            replicated(self.mesh) if self.mesh is not None else None,
        )

    def _stop_trace(self):
        jax.profiler.stop_trace()
        self._tracing = False
        print(f"profiler trace written to {self.cfg.profile_dir}")

    def _static_len_keep(self, mask_ratio: float):
        """Static token-drop count for one step/window, or None for the
        traced key-bias path.

        len_keep is a STATIC jit argument — every distinct value is a full
        recompile (~75 s through the remote tunnel).  With
        --random_mask_ratio each step draws a fresh continuous ratio
        (mask_ratio_for_step), so quantizing it would mint up to ~0.25*L
        distinct cache entries; fall back to the traced key-bias masking
        there (both the single-step and multi-dispatch paths, identically).
        Quantization uses the original python float, matching the
        reference's float64 int(L*(1-r)) (mae.py:330) — an np.float32
        round-trip can floor to one fewer kept token at representability
        boundaries."""
        if not self._token_L or self.cfg.random_mask_ratio or mask_ratio <= 0:
            return None
        lk = int(np.floor(self._token_L * (1.0 - float(mask_ratio))))
        return lk if lk < self._token_L else None

    # ------------------------------------------------------------------
    def _train_one_epoch_multi(self, epoch: int) -> float:
        """--steps_per_dispatch > 1: N steps per device dispatch via the
        scanned multi-step (steps.make_multi_train_step).  mask_ratio stays
        per-STEP (computed host-side per iteration); len_keep is quantized
        once per window; tail iterations that don't fill a window go through
        the single-step path."""
        cfg = self.cfg
        spd = int(cfg.steps_per_dispatch)
        self.loader.set_epoch(epoch)
        if cfg.profile_dir and epoch == 1:
            print(
                "WARNING: --profile_dir is only supported with "
                "--steps_per_dispatch 1 (the trace brackets individual step "
                "dispatches); no trace will be captured."
            )
        monitor = self._fresh_monitor()
        t_data = t_step = 0.0
        # per-window timing accumulators since the last CSV log line —
        # the multi path's analog of the single-step dt_i/st_i split
        win_data = win_step = 0.0
        tflag = time.time()
        buf = []                       # [(lms, mask_ratio, key)]
        dispatches = 0

        def flush(buf, monitor):
            nonlocal dispatches, win_data, win_step
            lms_stack = np.stack([b[0] for b in buf])
            ratios = np.asarray([b[1] for b in buf], np.float32)
            keys = jnp.stack([b[2] for b in buf])
            # len_keep is static for the whole window, so it can only stand
            # in for the per-step ratios when they are (near-)constant across
            # the window: fixed ratio, or the sine schedule (moves a fraction
            # of a token per window).  --random_mask_ratio draws a DIFFERENT
            # ratio per step (including 0 with p=0.5) — _static_len_keep
            # falls back to the traced key-bias masking there.
            len_keep = self._static_len_keep(buf[0][1])
            if len(buf) == spd:
                batches = shard_batch(lms_stack, self.mesh, axis=1)
                self.state, metrics, monitor = self.multi_step(
                    self.state, batches, keys, jnp.asarray(ratios), monitor,
                    len_keep=len_keep,
                )
                last_loss = metrics["loss"][-1]
            else:  # tail window: single-step dispatches, same math
                for (lms, mr, key) in buf:
                    self.state, metrics, monitor = self.train_step(
                        self.state, shard_batch(lms, self.mesh), key,
                        np.float32(mr), monitor, len_keep=len_keep,
                    )
                last_loss = metrics["loss"]
            dispatches += 1
            if dispatches % 10 == 0:
                self._check_monitor(monitor)
                if self.logger is not None:
                    # measured wall times accumulated since the last log,
                    # averaged per dispatch window (VERDICT r2 #6b: the
                    # split that justifies --steps_per_dispatch)
                    n_win = 10.0
                    self.logger.info(
                        "epoch,{},step,{},loss,{},data_time,{:.4f},step_time,{:.4f}"
                        .format(epoch, dispatches * spd, float(last_loss),
                                win_data / n_win, win_step / n_win))
                win_data = win_step = 0.0
            return monitor

        for it, (lms, _labels) in enumerate(self.loader):
            dt_i = time.time() - tflag
            t_data += dt_i
            win_data += dt_i
            iteration = self.niter_per_ep * (epoch - 1) + it
            mask_ratio = mask_ratio_for_step(
                cfg, self.mask_schedule, iteration, self.host_rng, byol=self.byol)
            self.rng_key, step_key = jax.random.split(self.rng_key)
            buf.append((np.asarray(lms), mask_ratio, step_key))
            tflag = time.time()
            if len(buf) == spd:
                monitor = flush(buf, monitor)
                buf = []
            st_i = time.time() - tflag
            t_step += st_i
            win_step += st_i
            tflag = time.time()
        if buf:
            tflag2 = time.time()
            monitor = flush(buf, monitor)
            t_step += time.time() - tflag2

        loss_sum = self._check_monitor(monitor)
        n_steps = int(jax.device_get(monitor["count"]))
        avg = loss_sum / max(n_steps, 1)
        print(
            f"Epoch [{epoch}/{cfg.epochs}] loss={avg:.4f} "
            f"data_time={t_data:.1f}s step_time={t_step:.1f}s "
            f"({n_steps * cfg.batch_size / max(t_data + t_step, 1e-9):.0f} samples/s)"
        )
        return avg

    # ------------------------------------------------------------------
    def train_one_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        if self.multi_step is not None:
            return self._train_one_epoch_multi(epoch)
        self.loader.set_epoch(epoch)
        monitor = self._fresh_monitor()
        t_data = t_step = 0.0
        tflag = time.time()
        for it, (lms, _labels) in enumerate(self.loader):
            dt_i = time.time() - tflag
            t_data += dt_i
            iteration = self.niter_per_ep * (epoch - 1) + it
            # optional jax.profiler trace of steps 10-20 of the first epoch
            # (SURVEY.md §5 tracing; view with TensorBoard/XProf)
            if cfg.profile_dir and epoch == 1:
                if iteration == min(10, self.niter_per_ep - 1):
                    jax.profiler.start_trace(cfg.profile_dir)
                    self._tracing = True
                elif iteration == 20 and getattr(self, "_tracing", False):
                    self._stop_trace()
            mask_ratio = mask_ratio_for_step(
                cfg, self.mask_schedule, iteration, self.host_rng, byol=self.byol
            )

            tflag = time.time()
            batch = shard_batch(lms, self.mesh)
            self.rng_key, step_key = jax.random.split(self.rng_key)
            len_keep = self._static_len_keep(mask_ratio)
            self.state, metrics, monitor = self.train_step(
                self.state, batch, step_key, np.float32(mask_ratio), monitor,
                len_keep=len_keep,
            )
            # sampled sync point: fetches the carried finite-flag, so a NaN at
            # ANY step since the last fetch aborts here (not just at it%50==0)
            if it % 50 == 0:
                self._check_monitor(monitor)
                loss_val = float(metrics["loss"])
                # per-step timing split (reference main.py:44-156 tqdm
                # segments data/forward/backward; under one fused jit the
                # forward+backward are a single device program, so the split
                # here is data_time vs step_time, where step_time at a sync
                # point covers dispatch + the device compute drained by it)
                st_i = time.time() - tflag
                if self.logger is not None:
                    self.logger.info(
                        "epoch,{},step,{},loss,{},data_time,{:.4f},step_time,{:.4f}"
                        .format(epoch, iteration, loss_val, dt_i, st_i)
                    )
                if self.wandb_run is not None:
                    self.wandb_run.log({"Loss": loss_val})
                    if cfg.masked_recon:
                        # reference main.py:163-167: the loss split is
                        # logged only when masked_recon is on
                        self.wandb_run.log({
                            "barlow twins loss": float(metrics["bt_loss"]),
                            "masked recon loss": float(metrics["recon_loss"]),
                        })
            t_step += time.time() - tflag
            tflag = time.time()

        # a trace started near a short first epoch's end is stopped here so
        # it is always written
        if getattr(self, "_tracing", False):
            self._stop_trace()
        # epoch-end fetch covers the tail steps; loss_sum/count is the TRUE
        # per-step average over the epoch (the reference averages every step)
        loss_sum = self._check_monitor(monitor)
        n_steps = int(jax.device_get(monitor["count"]))
        avg = loss_sum / max(n_steps, 1)
        print(
            f"Epoch [{epoch}/{cfg.epochs}] loss={avg:.4f} "
            f"data_time={t_data:.1f}s step_time={t_step:.1f}s "
            f"({self.niter_per_ep * cfg.batch_size / max(t_data + t_step, 1e-9):.0f} samples/s)"
        )
        return avg

    # ------------------------------------------------------------------
    def fit(
        self,
        ckpt_path: Optional[str] = None,
        resume_path: Optional[str] = None,
        eval_fn: Optional[Callable] = None,
    ):
        cfg = self.cfg
        start_epoch = 1
        if resume_path:
            state, start_epoch = ckpt_lib.load_checkpoint(
                resume_path, jax.device_get(self.state)
            )
            self.state = self._replicate(state)
            # deterministic resume (SURVEY.md §5; VERDICT r2 #4): restore the
            # step-key stream and the host mask-ratio generator so epochs
            # after the resume replay the exact randomness of an
            # uninterrupted run.  Checkpoints from before this feature have
            # no rng payload — they resume with seed-derived rng (the
            # reference's behavior, utils.py:37-46).
            rng = ckpt_lib.load_rng(resume_path)
            if rng is not None:
                self.rng_key, self.host_rng = rng
            print(f"Resumed from {resume_path} at epoch {start_epoch}")

        for epoch in range(start_epoch, cfg.epochs + 1):
            self.train_one_epoch(epoch)
            if ckpt_path and (epoch % cfg.epoch_save_f == 0 or epoch == cfg.epochs):
                path = os.path.join(ckpt_path, f"model_{epoch}")
                # the Orbax save is a COLLECTIVE in multi-process runs (it
                # barriers internally; the primary host writes) — every
                # process must call it.  Net effect = the reference's
                # save_on_master (utils.py:389-391): one file, rank-0 data.
                ckpt_lib.save_checkpoint(path, jax.device_get(self.state), epoch + 1)
                if jax.process_index() == 0:
                    ckpt_lib.save_rng(path, self.rng_key, self.host_rng)
                    print(f"Saved checkpoint {path}")
            if eval_fn and (epoch % cfg.epoch_eval_f == 0 or epoch == cfg.epochs):
                if not cfg.no_eval and jax.process_index() == 0:
                    scores = eval_fn(self.mods, self.state, epoch)
                    if self.logger is not None and scores:
                        self.logger.info(
                            "epoch,{},step,{},linear_score,{}".format(
                                epoch, self.niter_per_ep * epoch, scores
                            )
                        )
        return self.state
