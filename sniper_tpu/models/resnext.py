"""ResNeXt-101 trunk (64-group wide variant) with deformable C5.

Rebuild of /root/reference/symbols/faster/resnext_mx_101.py:69-250:
post-activation bottlenecks (conv -> BN -> relu) where all three convs
run at the block's output width and the 3x3 is grouped (num_group=64);
the shortcut is a conv+BN off the block input. C5 repeats the pattern
with a dilated, grouped deformable 3x3 (4 deformable groups on top of
the 64 conv groups). Stem and stage-1 BN frozen like the ResNet trunk.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sniper_tpu.models.resnet import sow_dcn_offset_stats
from sniper_tpu.ops.deform import deformable_conv

BN_EPS = 2e-5


class ResNeXtUnit(nn.Module):
    filters: int
    stride: int = 1
    dim_match: bool = True
    fix_bn: bool = False
    num_groups: int = 64
    deform: bool = False
    bn_momentum: float = 0.95
    bn_mode: str = "sync"      # "local" -> per-device statistics
    bn_groups: int = 1
    # lane-aligned supergroup count for the non-deform grouped 3x3
    # (feature_group_count); 1 = full block-diagonal dense expansion
    supergroups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        from sniper_tpu.models.norm import make_batch_norm

        use_ra = (not train) or self.fix_bn

        def bn(name):
            return make_batch_norm(
                use_running_average=use_ra, momentum=self.bn_momentum,
                epsilon=BN_EPS, dtype=self.dtype, name=name,
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
            )

        f = self.filters
        h = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        h = nn.relu(bn("bn1")(h)).astype(self.dtype)
        if self.deform:
            offsets = nn.Conv(
                4 * 2 * 9, (3, 3), padding=[(2, 2), (2, 2)],
                kernel_dilation=(2, 2), dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="offset",
            )(h.astype(jnp.float32))
            sow_dcn_offset_stats(self, offsets)
            kernel = self.param(
                "conv2_kernel",
                nn.initializers.variance_scaling(2.0, "fan_out",
                                                 "truncated_normal"),
                (3, 3, f // self.num_groups, f), jnp.float32,
            )
            h = deformable_conv(
                h, offsets, kernel.astype(self.dtype), num_groups=4,
                dilation=2, conv_groups=self.num_groups,
            ).astype(self.dtype)
        else:
            # Grouped 3x3 as a BLOCK-DIAGONAL dense conv. XLA lowers a
            # 64-group/width-4 grouped conv with the [.., G, Cg] split
            # carrying Cg=4 as the minormost (lane) dim, which the
            # T(4,128) tiled layout pads 4 -> 128: a measured 32x
            # memory expansion (692MB stage-1 activation -> 22.1GB HLO
            # temp, HBM OOM at the 1408x1920 canvas). Expanding the
            # grouped kernel to a dense [3,3,f,f] with zeros off the
            # group blocks costs G x the (tiny) conv FLOPs on the MXU
            # but keeps every tensor a clean [B,H,W,f] layout — the
            # TPU-native formulation of ResNeXt's grouped conv. The
            # param KEEPS the grouped shape [3,3,f/G,f] so reference
            # checkpoints import unchanged; math is exactly equal
            # (tests/test_model_variants.py block-diag parity test).
            #
            # supergroups > 1 is the intermediate formulation: the G
            # groups are packed into SG lane-aligned SUPERGROUPS of
            # G/SG groups each (feature_group_count=SG, block-diagonal
            # dense within each supergroup) at SG x fewer FLOPs than
            # the full dense expansion. Measured on the v5e
            # (scripts/profile_supergroups.py, round 5): SG=2/4 win
            # 13-20% at the 512x640 and 832x1088 canvases and 12-15%
            # at the 16x512^2 train shape, but LOSE 10-20% at the
            # 1408x1920 canvas (541 ms dense vs 652/594) — the large
            # canvas is bandwidth-bound, where the grouped form's
            # smaller per-group contraction hurts MXU utilization
            # without reducing HBM traffic. The multi-scale pyramid is
            # large-canvas-dominated (209 ms/img dense vs 228/213), so
            # the default stays 1; set network.RESNEXT_SUPERGROUPS=4
            # for training or small-canvas-dominated serving.
            G = self.num_groups
            cg = f // G
            # same param name/shape as the deform branch's bare kernel
            # so train/pretrained.py's conv2_kernel mapping row covers
            # both (MXNet grouped weight [O,cg,3,3] -> [3,3,cg,O])
            kernel = self.param(
                "conv2_kernel",
                nn.initializers.variance_scaling(2.0, "fan_out",
                                                 "truncated_normal"),
                (3, 3, cg, f), jnp.float32,
            )
            SG = max(int(self.supergroups), 1)
            if SG == 1:
                kr = kernel.reshape(3, 3, cg, G, f // G)
                dense = jnp.einsum(
                    "xycgd,hg->xyhcgd", kr, jnp.eye(G, dtype=kernel.dtype)
                ).reshape(3, 3, f, f)
            else:
                assert G % SG == 0, (self.num_groups, SG)
                gs, d = G // SG, f // G
                # channel layout is group-major on both sides, so
                # supergroup s owns CONTIGUOUS input/output channel
                # blocks [s*f/SG, (s+1)*f/SG) — exactly XLA's
                # feature_group_count slicing; block-diag over the gs
                # groups within each supergroup
                kr = kernel.reshape(3, 3, cg, SG, gs, d)
                dense = jnp.einsum(
                    "xycsgd,hg->xyhcsgd", kr,
                    jnp.eye(gs, dtype=kernel.dtype),
                ).reshape(3, 3, gs * cg, f)
            h = jax.lax.conv_general_dilated(
                h.astype(self.dtype), dense.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=SG,
            )
        h = nn.relu(bn("bn2")(h)).astype(self.dtype)
        h = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = bn("bn3")(h)
        if self.dim_match:
            sc = x.astype(jnp.float32)
        else:
            sc = nn.Conv(
                f, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="sc",
            )(x.astype(self.dtype))
            sc = bn("sc_bn")(sc)
        return nn.relu(h + sc).astype(self.dtype)


class ResNeXtTrunk(nn.Module):
    units: Sequence[int] = (3, 4, 23, 3)
    filters: Sequence[int] = (64, 256, 512, 1024, 2048)
    num_groups: int = 64
    bn_momentum: float = 0.95
    bn_mode: str = "sync"
    bn_groups: int = 1
    supergroups: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(
            self.filters[0], (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False, dtype=jnp.float32,
            name="conv0",
        )(x.astype(jnp.float32))
        h = h.astype(self.dtype)
        h = nn.BatchNorm(
            use_running_average=True, epsilon=BN_EPS, dtype=self.dtype,
            name="bn0",
        )(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for i in range(3):
            fix = i == 0
            h = ResNeXtUnit(
                self.filters[i + 1], stride=1 if i == 0 else 2,
                dim_match=False, fix_bn=fix, num_groups=self.num_groups,
                bn_momentum=self.bn_momentum, bn_mode=self.bn_mode,
                bn_groups=self.bn_groups, supergroups=self.supergroups,
                dtype=self.dtype, name=f"stage{i + 1}_unit1",
            )(h, train)
            for j in range(self.units[i] - 1):
                h = ResNeXtUnit(
                    self.filters[i + 1], dim_match=True, fix_bn=fix,
                    num_groups=self.num_groups,
                    bn_momentum=self.bn_momentum, bn_mode=self.bn_mode,
                    bn_groups=self.bn_groups,
                    supergroups=self.supergroups, dtype=self.dtype,
                    name=f"stage{i + 1}_unit{j + 2}",
                )(h, train)
        c4 = h

        h = ResNeXtUnit(
            self.filters[4], stride=1, dim_match=False, deform=True,
            num_groups=self.num_groups, bn_momentum=self.bn_momentum,
            bn_mode=self.bn_mode, bn_groups=self.bn_groups,
            dtype=self.dtype, name="stage4_unit1",
        )(c4, train)
        for j in range(self.units[3] - 1):
            h = ResNeXtUnit(
                self.filters[4], dim_match=True, deform=True,
                num_groups=self.num_groups, bn_momentum=self.bn_momentum,
                bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                dtype=self.dtype, name=f"stage4_unit{j + 2}",
            )(h, train)
        return c4, h
