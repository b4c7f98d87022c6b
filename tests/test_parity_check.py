"""Offline verification of the one-command parity harness.

scripts/parity_check.py is THE command to prove mAP parity with the
reference once real COCO + published weights exist (download_assets.sh
succeeds). Real assets don't exist here, so this drives the exact same
module end to end on a synthetic COCO set + a synthetic reference-
format ``.params`` checkpoint: import -> multi-scale detection ->
COCO-results json -> stats -> --expect comparison and exit codes.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_integration_cli import make_coco, tiny_model, write_cfg
from tests.test_pretrained import _inverse


def _write_synthetic_params(cfg_path, tmp_path):
    """A reference-container .params holding every mapped array of the
    tiny detector, random MXNet-layout values."""
    from sniper_tpu.config import load_config
    from sniper_tpu.train.pretrained import (
        _mapping_rows,
        _tree_get,
        save_mxnet_params,
    )

    cfg = load_config(cfg_path, [])
    model = tiny_model(cfg)
    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64.0, 1.0]])
    variables = model.init({"params": jax.random.PRNGKey(3)}, data, im_info,
                           train=False)
    rng = np.random.RandomState(11)
    params, stats = variables["params"], variables["batch_stats"]
    flat = {}
    for coll, path, mx_name, tr in _mapping_rows(params, stats):
        tree = params if coll == "params" else stats
        target = _tree_get(tree, path)
        if target is None:
            continue
        arr = _inverse(tr, tuple(np.shape(target)), rng)
        # tame scale so softmax probs aren't saturated
        flat[mx_name] = (np.asarray(arr) * 0.05).astype(np.float32)
    p = str(tmp_path / "synthetic-0001.params")
    save_mxnet_params(p, flat)
    return p


@pytest.mark.slow
def test_parity_check_end_to_end(tmp_path, monkeypatch):
    make_coco(tmp_path)
    cfg_path = write_cfg(tmp_path)
    params_path = _write_synthetic_params(cfg_path, tmp_path)

    import sniper_tpu.models.registry as registry

    monkeypatch.setitem(registry._REGISTRY, "resnet_mx_50_e2e", tiny_model)

    import scripts.parity_check as pc

    # run 1: no expectations -> stats computed, pass=True, exit 0
    out1 = []
    monkeypatch.setattr("builtins.print",
                        lambda *a, **k: out1.append(" ".join(map(str, a))))
    rc = pc.main(["--cfg", cfg_path, "--params", params_path])
    monkeypatch.undo()
    monkeypatch.setitem(registry._REGISTRY, "resnet_mx_50_e2e", tiny_model)
    assert rc == 0
    verdict = json.loads(out1[-1])
    assert verdict["pass"] and "AP" in verdict["stats"]
    assert "loaded" in verdict["import"]
    # results json written by the detection flow
    found = []
    for root, dirs, files in os.walk(str(tmp_path)):
        found += [f for f in files if f.startswith("detections_")]
    assert found, "parity run must write the COCO-results json"

    # cross-check: the verdict's stats equal a fresh direct run through
    # the same import + detection + eval path (determinism + no drift
    # between the harness and the library flow)
    from sniper_tpu.config import load_config
    from sniper_tpu.config.defaults import config_name

    cfg = load_config(cfg_path, ["network.pretrained", params_path])
    verdict2, ok2 = pc.run_parity(cfg, config_name(cfg_path))
    assert ok2
    for k, v in verdict["stats"].items():
        assert abs(verdict2["stats"][k] - v) < 1e-9, k

    # run 2: matching expectations pass, wrong expectations exit 3
    expect_ok = {"AP": verdict["stats"]["AP"]}
    rc_ok = pc.main(["--cfg", cfg_path, "--params", params_path,
                     "--expect", json.dumps(expect_ok), "--tol", "0.005"])
    assert rc_ok == 0
    rc_bad = pc.main(["--cfg", cfg_path, "--params", params_path,
                      "--expect", json.dumps({"AP": 0.99}),
                      "--tol", "0.001"])
    assert rc_bad == 3
