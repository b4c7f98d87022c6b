"""One-command checkpoint -> mAP parity harness.

Real COCO assets and the published SNIPER weights cannot be downloaded
in every environment (scripts/download_assets.sh exits 2 offline), so
46.5-mAP parity with the reference (README.md:37 table) can't always be
proven in CI — but the instrument ships here. When the assets exist,
THIS is the one command to run:

  python scripts/parity_check.py \\
      --cfg configs/sniper_res101_e2e.yml \\
      --params ./data/sniper_models/SNIPER --epoch 8 \\
      --expect '{"AP": 0.465}' --tol 0.005

Flow (reference main_test.py:44-61 detection path +
lib/train_utils/utils.py:96-99 checkpoint load): import the reference
``.params`` checkpoint through train/pretrained.py (MXNet-layout
mapping, strict shape checks, loud import report), run the full
multi-scale detection pipeline (test chips, optional AutoFocus,
per-scale NMS, cross-scale aggregation — main_test.run_detection),
write the COCO-results json + stats, and compare every stat named in
--expect within --tol. Prints ONE JSON verdict line; exit 0 iff all
expected stats are within tolerance (exit 3 on a parity miss).

--expect takes inline JSON or a path to a JSON file; keys match the
stats dict evaluate_detections returns (AP, AP50, AP75, APs, APm, APl,
AR1, AR10, AR100, ...; values are fractions, e.g. 0.465). For mask
configs the stats nest as {"bbox": {...}, "segm": {...}} and expected
keys may use the same nesting.

Offline verification: tests/test_parity_check.py drives this exact
module on a synthetic COCO set + a synthetic ``.params`` checkpoint
written in the reference container format, and cross-checks the stats
against a direct evaluate_detections run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="SNIPER-TPU checkpoint/mAP parity check")
    p.add_argument("--cfg", required=True)
    p.add_argument("--params", required=True,
                   help=".params path or reference prefix "
                        "(prefix-0008.params style)")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch for prefix resolution "
                        "(default: cfg.network.pretrained_epoch)")
    p.add_argument("--expect", default=None,
                   help="inline JSON or path to a JSON file of expected "
                        "stats (fractions)")
    p.add_argument("--tol", type=float, default=0.005,
                   help="absolute tolerance on each expected stat "
                        "(default 0.005 = 0.5 mAP points)")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    return p.parse_args(argv)


def _load_expect(spec):
    if spec is None:
        return None
    if os.path.exists(spec):
        with open(spec) as f:
            return json.load(f)
    return json.loads(spec)


def _flatten(stats, prefix=""):
    out = {}
    for k, v in stats.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + k + "/"))
        else:
            try:
                out[prefix + k] = float(v)
            except (TypeError, ValueError):
                pass
    return out


def run_parity(cfg, cfg_name, expect=None, tol=0.005):
    """Import the checkpoint, run multi-scale detection + eval, compare.

    Returns (verdict dict, ok bool); the caller prints/exits."""
    import jax
    import jax.numpy as jnp

    from main_test import build_test_dataset, run_detection
    from sniper_tpu.models.registry import get_model
    from sniper_tpu.train.pretrained import load_pretrained
    from sniper_tpu.utils.logger import create_logger

    logger, out_dir = create_logger(
        cfg.output_path or "./output", cfg_name,
        f"parity_{cfg.dataset.test_image_set}",
    )

    dataset = build_test_dataset(cfg)
    roidb = dataset.gt_roidb()
    logger.info(f"dataset {dataset.name}: {len(roidb)} images")

    model = get_model(cfg)
    data = jnp.zeros((1, 64, 64, 3))
    im_info = jnp.asarray([[64.0, 64.0, 1.0]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                           train=False)
    # always the reference-format .params path — this harness validates
    # published checkpoints, never an orbax run dir
    variables, report = load_pretrained(cfg, variables, logger)
    if report is None:
        raise SystemExit("network.pretrained is empty — pass --params")

    stats = run_detection(cfg, model, variables, roidb, dataset, out_dir)
    flat = _flatten(stats if isinstance(stats, dict) else {"AP": stats})

    verdict = {"stats": flat, "out_dir": out_dir,
               "import": report.summary()}
    ok = True
    if expect:
        checks = {}
        for k, want in _flatten(expect).items():
            got = flat.get(k)
            hit = got is not None and abs(got - want) <= tol
            checks[k] = {"want": want, "got": got, "ok": hit}
            ok = ok and hit
        verdict["expect"] = checks
        verdict["tol"] = tol
    verdict["pass"] = ok
    return verdict, ok


def main(argv=None):
    from sniper_tpu.config import load_config
    from sniper_tpu.config.defaults import config_name

    args = parse_args(argv)
    overrides = list(args.overrides)
    overrides += ["network.pretrained", args.params]
    if args.epoch is not None:
        overrides += ["network.pretrained_epoch", str(args.epoch)]
    cfg = load_config(args.cfg, overrides)

    verdict, ok = run_parity(cfg, config_name(args.cfg),
                             expect=_load_expect(args.expect),
                             tol=args.tol)
    print(json.dumps(verdict))
    return 0 if ok else 3


if __name__ == "__main__":
    sys.exit(main())
