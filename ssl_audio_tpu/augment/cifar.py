"""On-device CIFAR pair transform (reference utils/transforms.py:62-84
CifarPairTransform built on torchvision): RandomResizedCrop(32) -> hflip(0.5)
-> ColorJitter(0.4,0.4,0.4,0.1)@0.8 -> grayscale@0.2 -> normalize.

Batched, RNG-keyed; bilinear resize expressed as per-sample interpolation
matrices (same static-shape trick as the audio RandomResizeCrop)."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2023, 0.1994, 0.2010)


def _linear_matrix(out_size: int, in_size: int, start, extent) -> jnp.ndarray:
    """(out, in) bilinear-resample matrix over [start, start+extent) with
    torchvision's align_corners=False mapping."""
    u = jnp.arange(out_size, dtype=jnp.float32)
    scale = extent / out_size
    src = start + (u + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1.0)
    s0 = jnp.floor(src)
    t = src - s0
    taps = jnp.stack([s0, jnp.clip(s0 + 1, 0, in_size - 1)], axis=-1).astype(jnp.int32)
    w = jnp.stack([1.0 - t, t], axis=-1)
    onehot = jax.nn.one_hot(taps, in_size, dtype=jnp.float32)
    return jnp.einsum("ot,otc->oc", w, onehot)


def _rrc_single(key, img, out_size: int, scale: Tuple[float, float], ratio: Tuple[float, float]):
    """img (H, W, C) -> (out, out, C): torchvision RandomResizedCrop
    semantics (area scale + log-uniform aspect, fallback center crop)."""
    H, W, _ = img.shape
    area = H * W
    ks = jax.random.split(key, 4)
    target_area = area * jax.random.uniform(ks[0], (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        ks[1], (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.clip(jnp.round(jnp.sqrt(target_area * aspect)), 1, W)
    h = jnp.clip(jnp.round(jnp.sqrt(target_area / aspect)), 1, H)
    i = jnp.floor(jax.random.uniform(ks[2], ()) * (H - h + 1.0))
    j = jnp.floor(jax.random.uniform(ks[3], ()) * (W - w + 1.0))
    My = _linear_matrix(out_size, H, i, h)
    Mx = _linear_matrix(out_size, W, j, w)
    return jnp.einsum("yh,hwc,xw->yxc", My, img, Mx)


def _rgb_to_gray(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    return jnp.stack([y, y, y], axis=-1)


def _color_jitter(key, img, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1):
    """Brightness/contrast/saturation/hue jitter (torchvision factor ranges;
    fixed order rather than torchvision's random order)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    img = img * jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    mean = _rgb_to_gray(img)[..., :1].mean()
    img = (img - mean) * jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast) + mean
    gray = _rgb_to_gray(img)
    img = gray + (img - gray) * jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    # hue: rotate chroma in a YIQ-like space
    theta = jax.random.uniform(kh, (), minval=-hue, maxval=hue) * 2 * jnp.pi
    y = _rgb_to_gray(img)[..., 0]
    i = 0.596 * img[..., 0] - 0.274 * img[..., 1] - 0.322 * img[..., 2]
    q = 0.211 * img[..., 0] - 0.523 * img[..., 1] + 0.312 * img[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    i2, q2 = c * i - s * q, s * i + c * q
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.stack([r, g, b], axis=-1)


def _one_view(key, img):
    ks = jax.random.split(key, 5)
    v = _rrc_single(ks[0], img, 32, (0.08, 1.0), (3 / 4, 4 / 3))
    v = jnp.where(jax.random.uniform(ks[1], ()) < 0.5, v[:, ::-1], v)
    v = jnp.where(
        jax.random.uniform(ks[2], ()) < 0.8, _color_jitter(ks[3], v), v
    )
    v = jnp.where(jax.random.uniform(ks[4], ()) < 0.2, _rgb_to_gray(v), v)
    v = jnp.clip(v, 0.0, 1.0)
    return (v - jnp.asarray(CIFAR_MEAN)) / jnp.asarray(CIFAR_STD)


@jax.jit
def cifar_pair_views(key: jax.Array, images_u8: jnp.ndarray):
    """(B, 32, 32, 3) uint8 -> two augmented views (B, 3, 32, 32) each."""
    imgs = images_u8.astype(jnp.float32) / 255.0
    B = imgs.shape[0]
    k1, k2 = jax.random.split(key)
    v1 = jax.vmap(_one_view)(jax.random.split(k1, B), imgs)
    v2 = jax.vmap(_one_view)(jax.random.split(k2, B), imgs)
    to_nchw = lambda v: jnp.transpose(v, (0, 3, 1, 2))  # noqa: E731
    return to_nchw(v1), to_nchw(v2)


@jax.jit
def cifar_eval_batch(images_u8: jnp.ndarray) -> jnp.ndarray:
    imgs = images_u8.astype(jnp.float32) / 255.0
    imgs = (imgs - jnp.asarray(CIFAR_MEAN)) / jnp.asarray(CIFAR_STD)
    return jnp.transpose(imgs, (0, 3, 1, 2))
