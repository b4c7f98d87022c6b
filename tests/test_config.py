import numpy as np
import pytest

from sniper_tpu.config import default_config, load_config, update_config_from_list

REF_YML = "/root/reference/configs/faster/sniper_res101_e2e.yml"


def test_defaults_shape():
    c = default_config()
    assert c.TRAIN.RPN_BATCH_SIZE == 256
    assert c.TEST.RPN_POST_NMS_TOP_N == 300
    assert c.network.NUM_ANCHORS == 9


def test_load_reference_yaml():
    c = load_config(REF_YML)
    assert c.symbol == "resnet_mx_101_e2e"
    assert c.dataset.NUM_CLASSES == 81
    assert c.network.NUM_ANCHORS == 21
    assert list(c.network.ANCHOR_SCALES) == [2, 4, 7, 10, 13, 16, 24]
    assert isinstance(c.network.PIXEL_MEANS, np.ndarray)
    np.testing.assert_allclose(c.network.PIXEL_MEANS, [103.939, 116.779, 123.68])
    # python/tuple-tagged scales parse as tuples
    assert c.TRAIN.SCALES == [(1400, 2000), (800, 1280), (-1, 512)]
    assert c.TRAIN.VALID_RANGES == [(-1, 80), (32, 150), (120, -1)]
    assert c.TRAIN.BATCH_IMAGES == 16
    assert c.TRAIN.lr == 0.015
    # yml-only keys part of the real schema
    assert c.TEST.MAX_PER_IMAGE == 200
    assert c.TEST.CONCURRENT_JOBS == 2
    assert c.TEST.NMS_SIGMA == 0.55
    assert c.TEST.NMS == -1


def test_all_reference_ymls_load():
    import glob

    for f in glob.glob("/root/reference/configs/faster/*.yml"):
        c = load_config(f)
        assert c.symbol


def test_unknown_toplevel_key_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_cli_overrides():
    c = load_config(REF_YML, overrides=["TRAIN.lr", "0.02", "TEST.NMS", "0.4"])
    assert c.TRAIN.lr == 0.02
    assert c.TEST.NMS == 0.4
    with pytest.raises(AssertionError):
        update_config_from_list(c, ["TRAIN.not_a_key", "1"])


def test_instances_are_independent():
    a, b = default_config(), default_config()
    a.TRAIN.lr = 123
    assert b.TRAIN.lr != 123
