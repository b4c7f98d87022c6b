"""Pretrained import: MXNet .params container, name/layout mapping,
selective re-init, FIXED_PARAMS verification, torch forward parity.

Reference semantics: main_train.py:98-103 (load + selective init),
lib/train_utils/utils.py:45-100 (load_param / arg:/aux: handling),
symbols/faster/resnet_mx_101_e2e.py:450-505 (init_weight_rcnn).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sniper_tpu.train.pretrained import (
    MXParamsError,
    _mapping_rows,
    _t_conv,
    _t_deconv,
    _t_fc,
    _t_fc_from_pool,
    _tree_get,
    import_reference_params,
    load_flat_params,
    read_mxnet_params,
    resolve_pretrained_path,
    save_mxnet_params,
    strip_mx_prefixes,
    verify_fixed_params,
)


def test_params_container_roundtrip(tmp_path, rng):
    arrays = {
        "arg:conv0_weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "aux:bn0_moving_mean": rng.randn(64).astype(np.float32),
        "arg:some_fp16": rng.randn(4, 5).astype(np.float16),
        "arg:counts": np.arange(6, dtype=np.int32).reshape(2, 3),
    }
    p = str(tmp_path / "model-0000.params")
    save_mxnet_params(p, arrays)
    back = read_mxnet_params(p)
    assert set(back) == set(arrays)
    for k in arrays:
        assert back[k].dtype == arrays[k].dtype
        np.testing.assert_array_equal(back[k], arrays[k])
    flat = strip_mx_prefixes(back)
    assert "conv0_weight" in flat and "bn0_moving_mean" in flat


def test_params_reader_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.params")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(MXParamsError):
        read_mxnet_params(p)


def _inverse(tr, target_shape, rng):
    """Random MXNet-layout array whose transform has target_shape."""
    want = rng.randn(*target_shape).astype(np.float32) if target_shape else \
        np.float32(rng.randn())
    if tr is None:
        return want
    if tr is _t_conv:  # HWIO -> OIHW
        return np.transpose(want, (3, 2, 0, 1))
    if tr is _t_deconv:  # HWIO -> [in, out, kh, kw]
        return np.transpose(want, (2, 3, 0, 1))
    if tr is _t_fc:
        return np.transpose(want)
    if tr is _t_fc_from_pool:
        in_, out = want.shape
        c = 256
        p = int(round((in_ // c) ** 0.5))
        return want.reshape(p, p, c, out).transpose(3, 2, 0, 1).reshape(
            out, in_
        )
    raise AssertionError(f"unknown transform {tr}")


@pytest.fixture(scope="module")
def small_detector():
    from sniper_tpu.models.detector import SNIPERDetector

    model = SNIPERDetector(
        num_classes=5, num_anchors=3, anchor_scales=(2, 4, 7),
        anchor_ratios=(1.0,), units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=64, post_nms_top_n=8, num_rois=8, autofocus=True,
    )
    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64.0, 1.0]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                           train=False)
    return model, variables


def test_full_mapping_import(small_detector, rng):
    _, variables = small_detector
    params = variables["params"]
    stats = variables["batch_stats"]
    rows = _mapping_rows(params, stats)
    assert len(rows) > 60  # trunk + rpn + rcnn + autofocus all mapped
    flat = {}
    for coll, path, mx_name, tr in rows:
        tree = params if coll == "params" else stats
        target = _tree_get(tree, path)
        assert target is not None, path
        flat[mx_name] = _inverse(tr, tuple(np.shape(target)), rng)
    new_vars, report = import_reference_params(flat, variables)
    assert not report.missing and not report.mismatched
    assert not report.unmapped_keys
    assert len(report.loaded) == len(rows)
    for coll, path, mx_name, tr in rows:
        tree = new_vars[coll if coll == "params" else "batch_stats"]
        got = _tree_get(tree, path)
        want = tr(flat[mx_name]) if tr else flat[mx_name]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_backbone_only_import_is_selective_reinit(small_detector, rng):
    """An ImageNet-style backbone (trunk names only) must restore the
    trunk and leave every detection-layer param at its fresh init."""
    _, variables = small_detector
    params = variables["params"]
    rows = _mapping_rows(params, variables["batch_stats"])
    flat = {}
    for coll, path, mx_name, tr in rows:
        if path[0] != "trunk":
            continue
        tree = params if coll == "params" else variables["batch_stats"]
        flat[mx_name] = _inverse(tr, tuple(np.shape(_tree_get(tree, path))),
                                 rng)
    new_vars, report = import_reference_params(flat, variables)
    # trunk loaded
    got = np.asarray(new_vars["params"]["trunk"]["conv0"]["kernel"])
    np.testing.assert_allclose(got, _t_conv(flat["conv0_weight"]), rtol=1e-6)
    # heads untouched (selective re-init semantics)
    for head in ("rpn", "rcnn", "conv_new_1", "autofocus"):
        a = jax.tree_util.tree_leaves(params[head])
        b = jax.tree_util.tree_leaves(new_vars["params"][head])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # the mapped-but-absent heads are reported
    assert any(p[1] == "rpn" for p in report.missing)

    # FIXED_PARAMS verification: freezing loaded trunk prefixes is fine,
    # freezing a never-loaded head must raise
    verify_fixed_params(report, new_vars["params"],
                        ["conv0", "bn0", "stage1", "bn_data"])
    with pytest.raises(MXParamsError):
        verify_fixed_params(report, new_vars["params"], ["rpn_conv"])


def test_npz_and_prefix_resolution(tmp_path, rng):
    flat = {"arg:conv0_weight": rng.randn(8, 3, 7, 7).astype(np.float32)}
    np.savez(tmp_path / "bb.npz", **flat)
    loaded = load_flat_params(str(tmp_path / "bb.npz"))
    assert "conv0_weight" in loaded

    save_mxnet_params(str(tmp_path / "resnet-0003.params"), flat)
    p = resolve_pretrained_path(str(tmp_path / "resnet"), 3)
    assert p.endswith("resnet-0003.params")
    with pytest.raises(FileNotFoundError):
        resolve_pretrained_path(str(tmp_path / "nope"), 0)


# slow set: torch-oracle forward parity (drift guard, 40s)
@pytest.mark.slow
def test_torch_forward_parity(rng):
    """Import a torch-built pre-act ResNet's weights (exported under the
    MXNet names/layouts) and check the flax trunk computes the same
    features — pins the NCHW->NHWC kernel transposes and BN mapping."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as F

    from sniper_tpu.models.resnet import ResNetTrunk

    torch.manual_seed(0)
    C0, C1 = 8, 16  # stem filters, stage1 filters

    class PreActUnit(tnn.Module):
        def __init__(self, cin, cout, stride=1, dilation=1):
            super().__init__()
            mid = cout // 4
            self.bn1 = tnn.BatchNorm2d(cin, eps=2e-5)
            self.conv1 = tnn.Conv2d(cin, mid, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(mid, eps=2e-5)
            self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride,
                                    padding=dilation, dilation=dilation,
                                    bias=False)
            self.bn3 = tnn.BatchNorm2d(mid, eps=2e-5)
            self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
            self.sc = tnn.Conv2d(cin, cout, 1, stride=stride, bias=False)

        def forward(self, x):
            a1 = F.relu(self.bn1(x))
            h = self.conv1(a1)
            h = self.conv2(F.relu(self.bn2(h)))
            h = self.conv3(F.relu(self.bn3(h)))
            return h + self.sc(a1)

    class Trunk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.bn_data = tnn.BatchNorm2d(3, eps=2e-5)
            with torch.no_grad():
                self.bn_data.weight.fill_(1.0)  # fix_gamma=True
            self.conv0 = tnn.Conv2d(3, C0, 7, stride=2, padding=3,
                                    bias=False)
            self.bn0 = tnn.BatchNorm2d(C0, eps=2e-5)
            self.u1 = PreActUnit(C0, C1, 1)
            self.u2 = PreActUnit(C1, 2 * C1, 2)
            self.u3 = PreActUnit(2 * C1, 4 * C1, 2)
            self.u4 = PreActUnit(4 * C1, 8 * C1, 1, dilation=2)

        def forward(self, x):
            h = self.bn_data(x)
            h = self.conv0(h)
            h = F.relu(self.bn0(h))
            h = F.max_pool2d(h, 3, stride=2, padding=1)
            h = self.u1(h)
            h = self.u2(h)
            c4 = self.u3(h)
            return c4, self.u4(c4)

    t = Trunk().eval()
    # randomize BN statistics so the test pins the stats mapping too
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    def np_(x):
        return x.detach().numpy()

    flat = {}

    def export_bn(mod, name, gamma=True):
        if gamma:
            flat[f"{name}_gamma"] = np_(mod.weight)
        flat[f"{name}_beta"] = np_(mod.bias)
        flat[f"{name}_moving_mean"] = np_(mod.running_mean)
        flat[f"{name}_moving_var"] = np_(mod.running_var)

    export_bn(t.bn_data, "bn_data", gamma=False)
    flat["conv0_weight"] = np_(t.conv0.weight)
    export_bn(t.bn0, "bn0")
    for unit, mname in ((t.u1, "stage1_unit1"), (t.u2, "stage2_unit1"),
                        (t.u3, "stage3_unit1"), (t.u4, "stage4_unit1")):
        export_bn(unit.bn1, f"{mname}_bn1")
        export_bn(unit.bn2, f"{mname}_bn2")
        export_bn(unit.bn3, f"{mname}_bn3")
        flat[f"{mname}_conv1_weight"] = np_(unit.conv1.weight)
        flat[f"{mname}_conv2_weight"] = np_(unit.conv2.weight)
        flat[f"{mname}_conv3_weight"] = np_(unit.conv3.weight)
        flat[f"{mname}_sc_weight"] = np_(unit.sc.weight)

    trunk = ResNetTrunk(units=(1, 1, 1, 1), filters=(C0, C1, 2 * C1, 4 * C1,
                                                     8 * C1),
                        deform_c5=False, dtype=jnp.float32)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    variables = trunk.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    new_vars, report = import_reference_params(flat, variables)
    assert not report.missing and not report.mismatched, (
        report.missing, report.mismatched,
    )
    assert len(report.loaded) == len(flat)  # every export consumed

    with torch.no_grad():
        c4_t, c5_t = t(torch.from_numpy(x))
    c4_j, c5_j = trunk.apply(new_vars, jnp.asarray(x.transpose(0, 2, 3, 1)),
                             train=False)
    np.testing.assert_allclose(
        np.asarray(c4_j), np_(c4_t).transpose(0, 2, 3, 1),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(c5_j), np_(c5_t).transpose(0, 2, 3, 1),
        rtol=2e-3, atol=2e-3,
    )
