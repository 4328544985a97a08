"""Torch cross-check for the DINO collapse adjudication (VERDICT r4 #1).

Runs the REFERENCE's own DINO objective — `old/methods/dino.py` DINOLoss +
DINOHead, imported verbatim from /root/reference via tests/torch_shims — in a
minimal torch training loop (EMA teacher, AdamW, the reference's cosine
lr/wd + per-epoch teacher-temp warmup) on the same synthetic-multicue data
our JAX proof uses.  If the reference implementation shows the same
uniform-fixed-point dynamics (loss -> ln(out_dim)) under the dino.yaml
temp schedule at proof scale, the collapse is a property of the RECIPE at
this scale, not a bug in our port; if it learns where ours collapses, we
have a real defect to find.

    python tools/dino_torch_crosscheck.py --epochs 6 --steps 25 --batch 32 \
        --teacher_temp 0.4
"""
from __future__ import annotations

import argparse

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out_dim", type=int, default=4096)
    p.add_argument("--embed_dim", type=int, default=512)
    p.add_argument("--teacher_temp", type=float, default=0.4)
    p.add_argument("--warmup_teacher_temp", type=float, default=0.04)
    p.add_argument("--warmup_teacher_temp_epochs", type=int, default=18)
    p.add_argument("--base_lr", type=float, default=5.0e-4)
    p.add_argument("--momentum_teacher", type=float, default=0.996)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    import numpy as np
    import torch
    import torch.nn as nn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    os.pardir, "tests"))
    from torch_shims import import_reference_old

    dino_ref = import_reference_old("methods.dino")
    utils_ref = import_reference_old("utils.utils")

    torch.manual_seed(0)

    class TinyConvEncoder(nn.Module):
        """Small conv encoder standing in for the backbone; the cross-check
        compares OBJECTIVE dynamics, not architectures."""

        def __init__(self, embed_dim):
            super().__init__()
            self.net = nn.Sequential(
                nn.Conv2d(1, 32, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv2d(32, 64, 3, stride=2, padding=1), nn.ReLU(),
                nn.AdaptiveAvgPool2d((4, 4)), nn.Flatten(),
                nn.Linear(64 * 16, embed_dim),
            )

        def forward(self, x):
            return self.net(x)

    student_b = TinyConvEncoder(args.embed_dim)
    student_h = dino_ref.DINOHead(args.embed_dim, args.out_dim)
    # teacher starts as a copy of the student (dino.py:86: load_state_dict;
    # weight_norm modules don't support deepcopy)
    teacher_b = TinyConvEncoder(args.embed_dim)
    teacher_b.load_state_dict(student_b.state_dict())
    teacher_h = dino_ref.DINOHead(args.embed_dim, args.out_dim)
    teacher_h.load_state_dict(student_h.state_dict())
    for m in (teacher_b, teacher_h):
        for q in m.parameters():
            q.requires_grad = False

    loss_fn = dino_ref.DINOLoss(
        out_dim=args.out_dim, ncrops=2,
        warmup_teacher_temp=args.warmup_teacher_temp,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp_epochs=min(args.warmup_teacher_temp_epochs,
                                       args.epochs),
        nepochs=args.epochs)

    params = utils_ref.get_param_groups(
        nn.ModuleList([student_b, student_h]))
    opt = torch.optim.AdamW(params)
    niter = args.steps
    lr_sched = utils_ref.cosine_scheduler(
        args.base_lr * args.batch / 256.0, 1e-6, args.epochs, niter,
        warmup_epochs=0)
    wd_sched = utils_ref.cosine_scheduler(0.04, 0.4, args.epochs, niter)
    mom_sched = utils_ref.cosine_scheduler(args.momentum_teacher, 1.0,
                                           args.epochs, niter)

    # same multicue data family as the JAX proof
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.data.datasets import SyntheticMultiCue

    cfg = default_config(method="dino", model_type="audiontt",
                         batch_size=args.batch, epochs=args.epochs,
                         synthetic_steps_per_epoch=args.steps, no_eval=True)
    ds = SyntheticMultiCue(cfg, length=args.steps * args.batch, seed=0)
    data = np.stack([np.asarray(ds[i][0]) for i in range(len(ds))])

    rng = np.random.default_rng(1)

    def two_views(batch):
        """Two stochastic views: additive noise + independent gain jitter
        (stands in for the device-side RRC/mixup chain)."""
        vs = []
        for _ in range(2):
            v = batch + 0.2 * rng.standard_normal(batch.shape)
            v = v * (0.8 + 0.4 * rng.random((batch.shape[0], 1, 1, 1)))
            vs.append(torch.as_tensor(v, dtype=torch.float32))
        return vs

    ln_out = math.log(args.out_dim)
    rows = []
    it = 0
    for epoch in range(args.epochs):
        order = rng.permutation(len(data))
        losses = []
        for s in range(args.steps):
            idx = order[s * args.batch:(s + 1) * args.batch]
            v1, v2 = two_views(data[idx])
            for g in opt.param_groups:
                g["lr"] = lr_sched[it]
                if g.get("weight_decay", 0.0) != 0.0:
                    g["weight_decay"] = wd_sched[it]
            with torch.no_grad():
                t_out = torch.cat([teacher_h(teacher_b(v1)),
                                   teacher_h(teacher_b(v2))])
            s_out = torch.cat([student_h(student_b(v1)),
                               student_h(student_b(v2))])
            loss = loss_fn(s_out, t_out, epoch)
            opt.zero_grad()
            loss.backward()
            opt.step()
            with torch.no_grad():
                m = mom_sched[it]
                for pq, pk in zip(
                    list(student_b.parameters()) + list(student_h.parameters()),
                    list(teacher_b.parameters()) + list(teacher_h.parameters()),
                ):
                    pk.data.mul_(m).add_((1 - m) * pq.detach().data)
            losses.append(float(loss))
            it += 1
        with torch.no_grad():
            v1, _ = two_views(data[:args.batch])
            t_logit = teacher_h(teacher_b(v1))
            temp = loss_fn.teacher_temp_schedule[epoch]
            t_prob = torch.softmax((t_logit - loss_fn.center) / temp, dim=-1)
            t_ent = float(-(t_prob * t_prob.clamp_min(1e-12).log())
                          .sum(-1).mean())
            s_logit = student_h(student_b(v1))
            s_prob = torch.softmax(s_logit / 0.1, dim=-1)
            s_ent = float(-(s_prob * s_prob.clamp_min(1e-12).log())
                          .sum(-1).mean())
        row = {"epoch": epoch + 1, "loss": round(float(np.mean(losses)), 4),
               "temp": round(float(temp), 4), "ln_out_dim": round(ln_out, 4),
               "teacher_entropy": round(t_ent, 4),
               "student_entropy": round(s_ent, 4),
               "teacher_logit_bstd": round(float(t_logit.std(0).mean()), 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"args": vars(args), "rows": rows}, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
