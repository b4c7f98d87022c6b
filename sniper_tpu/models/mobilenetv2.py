"""MobileNetV2 trunk (SNIPER variant).

Rebuild of /root/reference/symbols/faster/mobilenetv2_e2e.py:18-227:
inverted-residual blocks (expand 1x1 -> depthwise 3x3 -> linear 1x1)
with relu6, BN momentum 0.995 / eps 1e-5, the standard (t, c, n, s)
table, and a final 1280-channel 1x1 conv. The detection feature is the
stride-32 map (spatial_scale 1/32 downstream); the reference runs the
trunk in fp16 after the first conv — bf16 here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (expansion t, channels c, repeats n, stride s) — standard MNv2 table
BOTTLENECK_PARAMS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


class MobileUnit(nn.Module):
    filters: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    bn_momentum: float = 0.995
    bn_mode: str = "sync"      # "local" -> per-device statistics
    bn_groups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        from sniper_tpu.models.norm import make_batch_norm

        pad = (self.kernel - 1) // 2
        h = nn.Conv(
            self.filters, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv2d",
        )(x)
        h = make_batch_norm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, name="batchnorm",
            bn_mode=self.bn_mode, bn_groups=self.bn_groups,
        )(h)
        return relu6(h) if self.act else h


class InvertedResidual(nn.Module):
    in_filters: int
    filters: int
    stride: int = 1
    expansion: int = 6
    shortcut: bool = False
    bn_mode: str = "sync"
    bn_groups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        exp = int(round(self.in_filters * self.expansion))
        bkw = dict(bn_mode=self.bn_mode, bn_groups=self.bn_groups)
        h = MobileUnit(exp, 1, 1, dtype=self.dtype, name="exp",
                       **bkw)(x, train)
        h = MobileUnit(exp, 3, self.stride, groups=exp, dtype=self.dtype,
                       name="depthwise", **bkw)(h, train)
        h = MobileUnit(self.filters, 1, 1, act=False, dtype=self.dtype,
                       name="linear", **bkw)(h, train)
        return x + h if self.shortcut else h


class MobileNetV2Trunk(nn.Module):
    """Returns (feat, feat): one stride-32 feature map (both 'c4' and
    'c5' slots point at it — the MNv2 symbol has a single map)."""

    multiplier: float = 1.0
    bn_mode: str = "sync"      # network.BN_MODE: per-device stats = "local"
    bn_groups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        bkw = dict(bn_mode=self.bn_mode, bn_groups=self.bn_groups)
        h = MobileUnit(
            int(round(32 * self.multiplier)), 3, 2, dtype=jnp.float32,
            name="first_conv", **bkw,
        )(x.astype(jnp.float32), train)
        h = h.astype(self.dtype)
        in_c = int(round(32 * self.multiplier))
        for i, (t, c, n, s) in enumerate(BOTTLENECK_PARAMS):
            c = int(round(c * self.multiplier))
            h = InvertedResidual(
                in_c, c, stride=s, expansion=t, shortcut=False,
                dtype=self.dtype, name=f"seq{i}_block0", **bkw,
            )(h, train)
            for j in range(1, n):
                h = InvertedResidual(
                    c, c, stride=1, expansion=t, shortcut=True,
                    dtype=self.dtype, name=f"seq{i}_block{j}", **bkw,
                )(h, train)
            in_c = c
        last = 1280 if self.multiplier <= 1.0 else int(1280 * self.multiplier)
        h = MobileUnit(last, 1, 1, dtype=self.dtype, name="last_conv",
                       **bkw)(h, train)
        h = h.astype(jnp.float32)
        return h, h
