"""MobileNetV2 / ResNeXt trunk variants + registry wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sniper_tpu.config import load_config
from sniper_tpu.models.detector import SNIPERDetector
from sniper_tpu.models.mobilenetv2 import MobileNetV2Trunk
from sniper_tpu.models.registry import get_model, list_models
from sniper_tpu.models.resnext import ResNeXtTrunk


def test_mobilenetv2_trunk_shapes():
    trunk = MobileNetV2Trunk(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = trunk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feat, _ = trunk.apply(v, x, train=False)
    assert feat.shape == (1, 2, 2, 1280)  # stride 32


def test_resnext_trunk_shapes():
    trunk = ResNeXtTrunk(units=(1, 1, 1, 1), num_groups=8, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = trunk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    c4, c5 = trunk.apply(v, x, train=False)
    assert c4.shape == (1, 4, 4, 1024)
    assert c5.shape == (1, 4, 4, 2048)
    # deformable C5 offsets exist and start at zero
    off = v["params"]["stage4_unit1"]["offset"]["kernel"]
    assert float(jnp.abs(off).max()) == 0.0


def test_grouped_deform_conv_zero_offset(rng):
    from sniper_tpu.ops.deform import deformable_conv

    B, H, W, C, G = 1, 8, 8, 16, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    k = (rng.randn(3, 3, C // G, C) * 0.1).astype(np.float32)
    offsets = np.zeros((B, H, W, 4 * 9 * 2), np.float32)
    got = deformable_conv(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(k),
                          num_groups=4, dilation=1, conv_groups=G)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        feature_group_count=G,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, 1:-1, 1:-1], np.asarray(want)[:, 1:-1, 1:-1],
        rtol=1e-4, atol=1e-4,
    )


def test_registry_names():
    names = list_models()
    for n in ("resnet_mx_101_e2e", "resnet_mx_50_e2e", "resnext_mx_101",
              "mobilenetv2_e2e"):
        assert n in names


def test_registry_builds_from_reference_configs():
    cfg = load_config("/root/reference/configs/faster/sniper_res101_e2e.yml")
    m = get_model(cfg)
    assert isinstance(m, SNIPERDetector)
    assert m.num_classes == 81 and m.num_anchors == 21

    cfg2 = load_config(
        "/root/reference/configs/faster/sniper_mobilenetv2_e2e.yml"
    )
    m2 = get_model(cfg2)
    assert m2.trunk_type == "mobilenetv2"
    assert m2.head_fc_dim == 512
    assert m2.feat_stride == 32


def test_mobilenetv2_detector_forward():
    model = SNIPERDetector(
        num_classes=5, num_anchors=9, anchor_scales=(2, 4, 7),
        anchor_ratios=(0.5, 1, 2), trunk_type="mobilenetv2",
        head_fc_dim=512, feat_stride=32, dtype=jnp.float32,
        pre_nms_top_n=64, post_nms_top_n=8, num_rois=8,
    )
    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64, 1.0]])
    v = model.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                   train=False)
    out = model.apply(v, data, im_info, train=False)
    assert out["cls_prob"].shape == (1, 8, 5)
    assert out["rois"].shape == (1, 8, 5)


def test_resnext_blockdiag_conv_matches_grouped(rng):
    """The ResNeXt unit's block-diagonal dense formulation of the
    grouped 3x3 (TPU layout fix: width-4 grouped convs lane-pad 32x)
    must equal lax's feature_group_count conv exactly."""
    import jax.numpy as jnp
    from jax import lax

    G, cg, f = 8, 4, 32
    x = jnp.asarray(rng.randn(2, 10, 12, f).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, cg, f).astype(np.float32))

    ref = lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=G,
    )
    kr = kernel.reshape(3, 3, cg, G, f // G)
    dense = jnp.einsum(
        "xycgd,hg->xyhcgd", kr, jnp.eye(G, dtype=kernel.dtype)
    ).reshape(3, 3, f, f)
    got = lax.conv_general_dilated(
        x, dense, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resnext_supergroup_conv_matches_grouped(rng):
    """The supergroup formulation (feature_group_count=SG with
    block-diagonal expansion WITHIN each supergroup — the 32x-FLOPs
    middle ground between the grouped conv and the full dense
    expansion) must also equal lax's feature_group_count=G conv, for
    every SG that divides G."""
    import jax.numpy as jnp
    from jax import lax

    G, cg, f = 8, 4, 32
    x = jnp.asarray(rng.randn(2, 10, 12, f).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, cg, f).astype(np.float32))
    ref = lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=G,
    )
    for SG in (2, 4):
        gs, d = G // SG, f // G
        kr = kernel.reshape(3, 3, cg, SG, gs, d)
        dense = jnp.einsum(
            "xycsgd,hg->xyhcsgd", kr, jnp.eye(gs, dtype=kernel.dtype)
        ).reshape(3, 3, gs * cg, f)
        got = lax.conv_general_dilated(
            x, dense, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=SG,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"SG={SG}")


def test_resnext_unit_supergroups_same_params_same_output(rng):
    """supergroups is a pure FORMULATION switch on ResNeXtUnit: the
    param tree is identical (grouped [3,3,cg,f] kernel) and the output
    must match between supergroups=1 (shipped dense expansion) and
    supergroups=2 applied to the SAME variables — so checkpoints move
    freely between formulations."""
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.resnext import ResNeXtUnit

    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    kw = dict(filters=32, dim_match=True, num_groups=8,
              dtype=jnp.float32)
    u1 = ResNeXtUnit(supergroups=1, **kw)
    u2 = ResNeXtUnit(supergroups=2, **kw)
    v = u1.init({"params": jax.random.PRNGKey(3)}, x, False)
    o1 = u1.apply(v, x, False)
    o2 = u2.apply(v, x, False)  # same variables, different formulation
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
