"""Generate the end-to-end golden-detections fixture.

The parity-critical inference host chain — per-chip decode/rescale,
per-class score filters, soft-NMS ordering, per-scale VALID_RANGES
area filters, MAX_PER_IMAGE cap (reference
/root/reference/lib/inference.py:152-370) — is guarded per-component
by oracles, but cross-round drift of the ASSEMBLED pipeline would slip
past them. This script freezes an exact pipeline output: a seeded tiny
detector over 3 deterministic synthetic images, run through the full
2-scale detect -> aggregate chain, written to
tests/fixtures/golden_detections.json. tests/test_golden_detections.py
re-runs the identical chain and asserts fp32-exact agreement.

Regenerate (ONLY after an intentional semantic change; the diff is the
review surface):
    python scripts/gen_golden_detections.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the fixture is a CPU artifact: generation and verification must run
# under the EXACT environment the test suite uses (tests/conftest.py) —
# same backend AND same XLA flags; a different host-device count
# changes XLA's reduction order by ~1e-6, which the fp32-exact test
# would flag as drift. Must happen before the first backend init.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

if jax.config.jax_platforms and \
        jax.config.jax_platforms.split(",")[0] != "cpu":
    jax.config.update("jax_platforms", "cpu")

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "golden_detections.json")

IM_W, IM_H = 320, 256
N_IMAGES = 3
NUM_CLASSES = 4


def synth_loader(name):
    """Deterministic 'photo': smooth noise + bright rectangles."""
    rng = np.random.RandomState(1000 + int(name.removeprefix("im")))
    im = rng.randint(40, 200, (IM_H, IM_W, 3), np.uint8)
    # a couple of high-contrast blocks so features aren't pure noise
    for _ in range(3):
        x, y = rng.randint(0, IM_W - 90), rng.randint(0, IM_H - 70)
        im[y : y + 60, x : x + 80] = rng.randint(0, 255, 3, np.uint8)
    return im


def make_cfg():
    from sniper_tpu.config import default_config

    cfg = default_config()
    # 2 scales finest->coarsest with ENGAGED valid ranges (finest keeps
    # small objects, coarsest keeps large — the aggregate filter is part
    # of the guarded surface), gaussian soft-NMS, per-image cap
    cfg.TEST.SCALES = [(-1, 320), (-1, 192)]
    cfg.TEST.BATCH_IMAGES = [1, 1]
    cfg.TEST.VALID_RANGES = [(-1, 90), (60, -1)]
    cfg.TEST.NMS = -1
    cfg.TEST.NMS_SIGMA = 0.55
    cfg.TEST.MAX_PER_IMAGE = 12
    cfg.TEST.DO_PRUNING = False
    cfg.TEST.AUTO_FOCUS = False
    cfg.network.PIXEL_MEANS = [103.939, 116.779, 123.68]
    return cfg


def run_chain():
    """The full multi-scale pipeline; returns all_boxes[class][image]."""
    import jax
    import jax.numpy as jnp

    from sniper_tpu.data.test_loader import (
        TestChipIterator,
        init_inference_crops,
    )
    from sniper_tpu.infer.tester import (
        Tester,
        device_normalize,
        pack_detections,
    )
    from sniper_tpu.models.detector import SNIPERDetector

    cfg = make_cfg()
    model = SNIPERDetector(
        num_classes=NUM_CLASSES, num_anchors=9,
        anchor_scales=(2, 4, 7), anchor_ratios=(0.5, 1, 2),
        units=(1, 1, 1, 1), dtype=jnp.float32,
        pre_nms_top_n=200, post_nms_top_n=24, num_rois=24,
    )
    data0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    info0 = jnp.asarray([[128.0, 128.0, 1.0]], jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(42)}, data0, info0, train=False
    )

    @jax.jit
    def fwd(variables, data, im_info):
        d = device_normalize(data, im_info, cfg.network.PIXEL_MEANS)
        return pack_detections(model.apply(variables, d, im_info,
                                           train=False))

    roidb = [
        {"image": f"im{i}", "width": IM_W, "height": IM_H, "flipped": False}
        for i in range(N_IMAGES)
    ]
    init_inference_crops(roidb)
    tester = Tester(lambda d, i: fwd(variables, d, i), cfg, NUM_CLASSES)

    scale_dets = []
    for s in range(len(cfg.TEST.SCALES)):
        batches = TestChipIterator(
            roidb, cfg, s, cfg.TEST.BATCH_IMAGES[s],
            image_loader=synth_loader,
        )
        all_boxes, _ = tester.get_detections(iter(batches), roidb)
        scale_dets.append(all_boxes)
    return tester.aggregate(scale_dets, len(roidb))


def main():
    final = run_chain()
    out = {
        "num_classes": NUM_CLASSES,
        "num_images": N_IMAGES,
        "dets": [
            [np.asarray(final[c][i], np.float32).tolist()
             for i in range(N_IMAGES)]
            for c in range(NUM_CLASSES)
        ],
    }
    with open(FIXTURE, "w") as f:
        json.dump(out, f)
    n = sum(len(final[c][i]) for c in range(NUM_CLASSES)
            for i in range(N_IMAGES))
    print(f"wrote {FIXTURE}: {n} detections")


if __name__ == "__main__":
    main()
