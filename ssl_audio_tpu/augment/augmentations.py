"""BYOL-A style log-mel augmentations as batched, RNG-keyed device ops.

The reference (augmentations.py, taken from nttcslab/byol-a v2) runs these
per-sample on CPU inside DataLoader workers — its #1 hot loop (SURVEY.md §3.1).
Here every augmentation is a pure function over a whole batch: static shapes,
vmapped per-sample randomness, and the bicubic RandomResizeCrop expressed as
two small per-sample interpolation matrices so the resample is a pair of MXU
matmuls instead of a dynamic-shape crop.

Semantics parity (tested in tests/test_augment.py):
  * random_resize_crop  == reference RandomResizeCrop (augmentations.py:12-61):
    zero "virtual crop canvas", input pasted center, crop of random scale,
    torch-bicubic (a=-0.75) resize with align_corners=True.
  * mixup_byola         == MixupBYOLA (augmentations.py:88-122) with the FIFO
    memory bank carried as an on-device ring buffer.
  * random_linear_fader == RandomLinearFader (augmentations.py:64-78).
  * mix_gaussian_noise  == MixGaussianNoise (augmentations.py:125-140).
  * normalize_batch     == NormalizeBatch (augmentations.py:217-236), unbiased
    std over axes (0, 2, 3).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TORCH_EPS = float(np.finfo(np.float32).eps)


# ---------------------------------------------------------------------------
# Bicubic resize-by-matrix (torch F.interpolate(mode='bicubic',
# align_corners=True) on a crop, without materializing the crop)
# ---------------------------------------------------------------------------

def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Cubic-convolution weights for taps at distances (1+t, t, 1-t, 2-t).

    Same kernel as torch's bicubic (Keys, a=-0.75).  t in [0,1),
    returns (..., 4)."""
    def k1(x):   # |x| <= 1
        return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0

    def k2(x):   # 1 < |x| < 2
        return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a

    return jnp.stack([k2(1.0 + t), k1(t), k1(1.0 - t), k2(2.0 - t)], axis=-1)


def _interp_matrix(
    out_size: int, canvas_size: int, start: jnp.ndarray, extent: jnp.ndarray
) -> jnp.ndarray:
    """(out_size, canvas_size) matrix M with M @ canvas_axis == 1-D bicubic
    resize (align_corners=True) of canvas[start : start+extent] to out_size.

    `start`/`extent` are traced scalars — the crop never becomes a dynamic
    shape.  Taps are clamped to the crop bounds, replicating torch's
    access-bounded bicubic on the cropped tensor."""
    u = jnp.arange(out_size, dtype=jnp.float32)
    scale = jnp.where(out_size > 1, (extent - 1.0) / max(out_size - 1, 1), 0.0)
    src = start + u * scale                               # (out,)
    src0 = jnp.floor(src)
    t = src - src0
    w = _cubic_weights(t)                                 # (out, 4)
    taps = src0[:, None] + jnp.arange(-1.0, 3.0)[None, :]  # (out, 4)
    taps = jnp.clip(taps, start, start + extent - 1.0)
    taps = jnp.round(taps).astype(jnp.int32)
    onehot = jax.nn.one_hot(taps, canvas_size, dtype=jnp.float32)  # (out,4,C)
    return jnp.einsum("of,ofc->oc", w, onehot)


def _rrc_single(
    key: jax.Array,
    lms: jnp.ndarray,           # (C, F, T)
    out_size: Tuple[int, int],
    virtual_crop_scale: Tuple[float, float],
    freq_scale: Tuple[float, float],
    time_scale: Tuple[float, float],
) -> jnp.ndarray:
    F_in, T_in = lms.shape[-2:]
    canvas_h = int(F_in * virtual_crop_scale[0])
    canvas_w = int(T_in * virtual_crop_scale[1])
    y_off = (canvas_h - F_in) // 2
    x_off = (canvas_w - T_in) // 2
    canvas = jnp.zeros((lms.shape[0], canvas_h, canvas_w), lms.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, lms, (0, y_off, x_off))

    k1, k2, k3, k4 = jax.random.split(key, 4)
    # reference get_params (augmentations.py:30-38): int() floors the scaled
    # size; offsets are inclusive-uniform over the remaining room
    h = jnp.clip(
        jnp.floor(jax.random.uniform(k1, (), minval=freq_scale[0], maxval=freq_scale[1]) * F_in),
        1, canvas_h,
    )
    w = jnp.clip(
        jnp.floor(jax.random.uniform(k2, (), minval=time_scale[0], maxval=time_scale[1]) * T_in),
        1, canvas_w,
    )
    i = jnp.floor(jax.random.uniform(k3, ()) * (canvas_h - h + 1.0))
    j = jnp.floor(jax.random.uniform(k4, ()) * (canvas_w - w + 1.0))

    My = _interp_matrix(out_size[0], canvas_h, i, h)       # (H_out, canvas_h)
    Mx = _interp_matrix(out_size[1], canvas_w, j, w)       # (W_out, canvas_w)
    # out[c] = My @ canvas[c] @ Mx^T — two tiny MXU matmuls per sample
    return jnp.einsum(
        "hc,kcw,xw->khx", My, canvas, Mx,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def random_resize_crop(
    key: jax.Array,
    lms: jnp.ndarray,           # (B, C, F, T)
    out_size: Tuple[int, int] = (64, 96),
    virtual_crop_scale: Tuple[float, float] = (1.0, 1.5),
    freq_scale: Tuple[float, float] = (0.6, 1.5),
    time_scale: Tuple[float, float] = (0.6, 1.5),
) -> jnp.ndarray:
    """Batched RandomResizeCrop; independent params per sample."""
    keys = jax.random.split(key, lms.shape[0])
    fn = functools.partial(
        _rrc_single,
        out_size=out_size,
        virtual_crop_scale=virtual_crop_scale,
        freq_scale=freq_scale,
        time_scale=time_scale,
    )
    return jax.vmap(fn)(keys, lms)


def resize_bicubic_crop(
    lms: jnp.ndarray, i: int, j: int, h: int, w: int,
    out_size: Tuple[int, int],
    virtual_crop_scale: Tuple[float, float] = (1.0, 1.5),
) -> jnp.ndarray:
    """Deterministic crop+resize for parity testing: same canvas/paste as the
    random path but with fixed (i, j, h, w)."""
    F_in, T_in = lms.shape[-2:]
    canvas_h = int(F_in * virtual_crop_scale[0])
    canvas_w = int(T_in * virtual_crop_scale[1])
    y_off = (canvas_h - F_in) // 2
    x_off = (canvas_w - T_in) // 2
    canvas = jnp.zeros((lms.shape[0], canvas_h, canvas_w), lms.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, lms, (0, y_off, x_off))
    My = _interp_matrix(out_size[0], canvas_h, jnp.float32(i), jnp.float32(h))
    Mx = _interp_matrix(out_size[1], canvas_w, jnp.float32(j), jnp.float32(w))
    return jnp.einsum("hc,kcw,xw->khx", My, canvas, Mx,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# MixupBYOLA with an on-device ring-buffer memory bank
# ---------------------------------------------------------------------------

class MixupState(NamedTuple):
    """FIFO memory bank of past (pre-augmentation) log-mels.

    The reference keeps a 2048-entry python list per DataLoader worker
    (augmentations.py:101-115); here one global ring buffer lives in device
    memory and is carried through the jitted train step."""

    bank: jnp.ndarray      # (n_memory, C, F, T)
    count: jnp.ndarray     # () int32 — number of valid entries
    pos: jnp.ndarray       # () int32 — next write position


def init_mixup_state(n_memory: int, shape: Tuple[int, ...]) -> MixupState:
    return MixupState(
        bank=jnp.zeros((n_memory,) + tuple(shape), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((), jnp.int32),
    )


def log_mixup_exp(xa: jnp.ndarray, xb: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Reference augmentations.py:81-85."""
    x = alpha * jnp.exp(xa) + (1.0 - alpha) * jnp.exp(xb)
    return jnp.log(x + TORCH_EPS)


# A/B hook (tools/ benches + tests only): force the modular-row scatter
# write even when the contiguous dynamic-update-slice applies.
_FORCE_SCATTER_WRITE = False


def mixup_byola(
    key: jax.Array,
    x: jnp.ndarray,            # (B, C, F, T)
    state: MixupState,
    ratio: float = 0.2,
    update_bank: bool = True,
) -> Tuple[jnp.ndarray, MixupState]:
    """Mix each sample with a random memory-bank entry in linear-power domain.

    mixed_i = log((1-a_i) e^{x_i} + a_i e^{z_i} + eps), a_i = ratio*U(0,1).
    When the bank is empty (step 0) the input passes through unchanged, as in
    the reference's `if self.memory_bank:` guard."""
    B = x.shape[0]
    k_alpha, k_idx = jax.random.split(key)
    alpha = ratio * jax.random.uniform(k_alpha, (B, 1, 1, 1))
    # z index ~ U{0, count-1}; harmless when count==0 (output unused)
    u = jax.random.uniform(k_idx, (B,))
    idx = jnp.floor(u * jnp.maximum(state.count, 1)).astype(jnp.int32)
    z = state.bank[idx]                                    # (B, C, F, T)
    mixed = log_mixup_exp(x, z, 1.0 - alpha)
    out = jnp.where(state.count > 0, mixed, x)

    if update_bank:
        n = state.bank.shape[0]
        # ring-buffer write of the whole batch; requires B <= n
        if n % B == 0 and not _FORCE_SCATTER_WRITE:
            # pos starts at 0 and advances by B, so with B | n the write
            # region never wraps: the batch lands as ONE contiguous block.
            # dynamic_update_slice instead of a B-row scatter — same rows,
            # same values, but XLA lowers DUS to an in-place block copy
            # while a traced-index scatter serializes through the scalar
            # core (measured on the training-step trace, PERF.md r4).
            bank = jax.lax.dynamic_update_slice(
                state.bank, x.astype(state.bank.dtype),
                (state.pos,) + (jnp.zeros((), jnp.int32),) * (x.ndim - 1))
        else:
            rows = (state.pos + jnp.arange(B)) % n
            bank = state.bank.at[rows].set(x)
        state = MixupState(
            bank=bank,
            count=jnp.minimum(state.count + B, n),
            pos=(state.pos + B) % n,
        )
    return out, state


# ---------------------------------------------------------------------------
# RandomLinearFader / MixGaussianNoise / NormalizeBatch
# ---------------------------------------------------------------------------

def random_linear_fader(key: jax.Array, lms: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Add a per-sample linear gain ramp: ends ~ gain*U(-1,1)."""
    B, _, _, T = lms.shape
    ends = gain * (2.0 * jax.random.uniform(key, (B, 2)) - 1.0)
    head, tail = ends[:, 0], ends[:, 1]
    u = jnp.linspace(0.0, 1.0, T)
    slope = head[:, None] + (tail - head)[:, None] * u[None, :]   # (B, T)
    return lms + slope[:, None, None, :]


def mix_gaussian_noise(key: jax.Array, lms: jnp.ndarray, ratio: float = 0.2) -> jnp.ndarray:
    """Reference MixGaussianNoise (augmentations.py:125-140):
    x=e^lms; lambd=ratio*U(0,1); mixed=(1-lambd)x + e^N(0,lambd) + eps; log."""
    B = lms.shape[0]
    k_l, k_n = jax.random.split(key)
    lambd = ratio * jax.random.uniform(k_l, (B, 1, 1, 1))
    x = jnp.exp(lms)
    z = jnp.exp(lambd * jax.random.normal(k_n, lms.shape))
    mixed = (1.0 - lambd) * x + z + TORCH_EPS
    return jnp.log(mixed)


def normalize_batch(x: jnp.ndarray, axis=(0, 2, 3)) -> jnp.ndarray:
    """Per-batch standardization with unbiased std (torch .std default)."""
    mean = x.mean(axis=axis, keepdims=True)
    std = x.std(axis=axis, keepdims=True, ddof=1)
    std = jnp.clip(std, TORCH_EPS, None)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# RunningNorm (streaming per-axis stats, frozen after max_update samples)
# ---------------------------------------------------------------------------

class RunningNormState(NamedTuple):
    n: jnp.ndarray        # () int32 — number of put() calls so far
    mu: jnp.ndarray       # mean, shape of one reduced sample
    s2: jnp.ndarray       # running mean of squared deviation
    s2_n: jnp.ndarray     # () int32


def init_running_norm_state(shape: Tuple[int, ...]) -> RunningNormState:
    z = jnp.zeros(shape, jnp.float32)
    return RunningNormState(
        n=jnp.zeros((), jnp.int32), mu=z, s2=z, s2_n=jnp.zeros((), jnp.int32)
    )


def running_norm(
    x: jnp.ndarray,
    state: RunningNormState,
    max_update: int,
    axis=(1, 2),
) -> Tuple[jnp.ndarray, RunningNormState]:
    """Reference RunningNorm (augmentations.py:187-214) including its
    characteristic off-by-one incremental mean (`mu += (m - mu)/n` with n
    incremented afterwards)."""
    m = x.mean(axis=axis, keepdims=True)

    def upd(st: RunningNormState) -> RunningNormState:
        mu = jnp.where(st.n == 0, m, st.mu + (m - st.mu) / jnp.maximum(st.n, 1))
        d2 = ((x - mu) ** 2).mean(axis=axis, keepdims=True)
        s2 = jnp.where(st.s2_n == 0, d2, st.s2 + (d2 - st.s2) / jnp.maximum(st.s2_n, 1))
        return RunningNormState(n=st.n + 1, mu=mu, s2=s2, s2_n=st.s2_n + 1)

    new_state = jax.lax.cond(state.n < max_update, upd, lambda st: st, state)
    std = jnp.clip(jnp.sqrt(new_state.s2), TORCH_EPS, None)
    return (x - new_state.mu) / std, new_state
