"""Audio-modified ResNet encoders (reference models/resnet.py).

Modifications carried over from the reference:
  * 1-channel input, ResNet-C deep stem (resnet.py:180-191), optional
    ResNet-D downsample (239-244)
  * per-layer stride plans: standard [2,1,2,2,2] (resnet.py:306); ReGP+NarrowRF
    [1,1,2,2,(1,2)] with the ReGP head = reshape (freq x chan) then mean+max
    pool over time (resnet.py:282-288, 358)

NHWC layout internally; input is the reference's (B, 1, F, T).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple, Type, Union

import flax.linen as nn
import jax.numpy as jnp


# reference init: kaiming_normal(fan_out, relu) for every conv
# (resnet.py:207-212); BatchNorm scale=1/bias=0 is the flax default
_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _as_hw(stride) -> Tuple[int, int]:
    if isinstance(stride, (list, tuple)):
        return (int(stride[0]), int(stride[1]))
    return (int(stride), int(stride))


class BasicBlock(nn.Module):
    planes: int
    stride: Tuple[int, int] = (1, 1)
    use_projection: bool = False
    D: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=_KAIMING, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=1, padding=1,
                      use_bias=False, kernel_init=_KAIMING, name="conv2")(out)
        out = bn("bn2")(out)
        if self.use_projection:
            if self.D and self.stride != (1, 1):
                identity = nn.avg_pool(identity, self.stride, strides=self.stride)
                identity = nn.Conv(self.planes, (1, 1), strides=1,
                                   use_bias=False, kernel_init=_KAIMING, name="down_conv")(identity)
            else:
                identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                                   use_bias=False, kernel_init=_KAIMING, name="down_conv")(identity)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck: stride on the 3x3 conv."""

    planes: int
    stride: Tuple[int, int] = (1, 1)
    use_projection: bool = False
    D: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=_KAIMING, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=_KAIMING, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=_KAIMING, name="conv3")(out)
        out = bn("bn3")(out)
        if self.use_projection:
            if self.D and self.stride != (1, 1):
                identity = nn.avg_pool(identity, self.stride, strides=self.stride)
                identity = nn.Conv(self.planes * 4, (1, 1), strides=1,
                                   use_bias=False, kernel_init=_KAIMING, name="down_conv")(identity)
            else:
                identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                                   use_bias=False, kernel_init=_KAIMING, name="down_conv")(identity)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    block_cls: Type[Union[BasicBlock, Bottleneck]]
    layers: Sequence[int]
    strides: Sequence[Any]              # 5 entries: stem + 4 stages
    ReGP: bool = False
    C: bool = True
    D: bool = False

    @property
    def embed_dim(self) -> int:
        c = 512 * self.block_cls.expansion
        if not self.ReGP:
            return c
        # freq extent after the stride plan (n_mels=64 assumed, as reference)
        f = 64
        f //= _as_hw(self.strides[0])[0]
        f //= 2  # maxpool
        for s in self.strides[1:]:
            f //= _as_hw(s)[0]
        return c * f

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        h = jnp.transpose(x, (0, 2, 3, 1))                    # NHWC
        s0 = _as_hw(self.strides[0])
        if self.C:  # deep stem
            h = nn.Conv(32, (3, 3), strides=s0, padding=1, use_bias=False, kernel_init=_KAIMING, name="stem1")(h)
            h = nn.relu(bn("stem_bn1")(h))
            h = nn.Conv(32, (3, 3), strides=1, padding=1, use_bias=False, kernel_init=_KAIMING, name="stem2")(h)
            h = nn.relu(bn("stem_bn2")(h))
            h = nn.Conv(64, (3, 3), strides=1, padding=1, use_bias=False, kernel_init=_KAIMING, name="stem3")(h)
            h = nn.relu(bn("stem_bn3")(h))
        else:
            h = nn.Conv(64, (7, 7), strides=s0, padding=3, use_bias=False, kernel_init=_KAIMING, name="stem")(h)
            h = nn.relu(bn("stem_bn")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_planes = 64
        for stage, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, self.strides[1:])
        ):
            s = _as_hw(stride)
            for b in range(blocks):
                blk_stride = s if b == 0 else (1, 1)
                needs_proj = b == 0 and (
                    blk_stride != (1, 1) or in_planes != planes * self.block_cls.expansion
                )
                h = self.block_cls(
                    planes=planes,
                    stride=blk_stride,
                    use_projection=needs_proj,
                    D=self.D,
                    name=f"layer{stage + 1}_{b}",
                )(h, train=train)
                in_planes = planes * self.block_cls.expansion

        if self.ReGP:
            # (B, F, T, C) -> (B, T, F*C) -> mean+max over time
            B, F, T, C = h.shape
            h = jnp.transpose(h, (0, 2, 1, 3)).reshape(B, T, F * C)
            return h.max(axis=1) + h.mean(axis=1)
        return h.mean(axis=(1, 2))                            # global avg pool


def resnet18(**kw) -> ResNet:
    return ResNet(BasicBlock, [2, 2, 2, 2], [2, 1, 2, 2, 2], **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(BasicBlock, [3, 4, 6, 3], [2, 1, 2, 2, 2], **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(Bottleneck, [3, 4, 6, 3], [2, 1, 2, 2, 2], **kw)


def resnet18_ReGP_NRF(**kw) -> ResNet:
    return ResNet(BasicBlock, [2, 2, 2, 2], [1, 1, 2, 2, (1, 2)], ReGP=True, **kw)


def resnet34_ReGP_NRF(**kw) -> ResNet:
    return ResNet(BasicBlock, [3, 4, 6, 3], [1, 1, 2, 2, (1, 2)], ReGP=True, **kw)


def resnet50_ReGP_NRF(**kw) -> ResNet:
    return ResNet(Bottleneck, [3, 4, 6, 3], [1, 1, 2, 2, (1, 2)], ReGP=True, **kw)
