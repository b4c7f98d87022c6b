"""Single-image SNIPER-TPU demo (reference demo.py:35-116).

Builds a one-image roidb with a full-image inference crop, runs
multi-scale detection, aggregates, and writes a visualization.

  python demo.py --cfg configs/sniper_res101_e2e.yml --im_path img.jpg
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="SNIPER-TPU demo")
    p.add_argument("--cfg", required=True)
    p.add_argument("--im_path", required=True)
    p.add_argument("--out_path", default="demo_out.jpg")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    return p.parse_args()


# the reference hardcodes the COCO class list (demo.py:63-73)
COCO_CLASSES = [
    "__background__", "person", "bicycle", "car", "motorcycle", "airplane",
    "bus", "train", "truck", "boat", "traffic light", "fire hydrant",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis",
    "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
    "skateboard", "surfboard", "tennis racket", "bottle", "wine glass",
    "cup", "fork", "knife", "spoon", "bowl", "banana", "apple", "sandwich",
    "orange", "broccoli", "carrot", "hot dog", "pizza", "donut", "cake",
    "chair", "couch", "potted plant", "bed", "dining table", "toilet",
    "tv", "laptop", "mouse", "remote", "keyboard", "cell phone",
    "microwave", "oven", "toaster", "sink", "refrigerator", "book",
    "clock", "vase", "scissors", "teddy bear", "hair drier", "toothbrush",
]


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sniper_tpu.config import load_config
    from sniper_tpu.config.defaults import config_name
    from sniper_tpu.data.test_loader import TestChipIterator, init_inference_crops
    from sniper_tpu.infer.tester import Tester
    from sniper_tpu.models.registry import get_model
    from sniper_tpu.train.checkpoint import restore_inference_variables
    from sniper_tpu.utils.visualization import draw_detections

    args = parse_args()
    cfg = load_config(args.cfg, args.overrides)

    im = cv2.imread(args.im_path, cv2.IMREAD_COLOR)
    assert im is not None, f"cannot read {args.im_path}"
    roidb = [{
        "image": args.im_path,
        "width": im.shape[1],
        "height": im.shape[0],
        "flipped": False,
    }]
    init_inference_crops(roidb)

    model = get_model(cfg)
    # trained weights: orbax run dir or reference-format checkpoint,
    # like the reference demo's load_param (demo.py:77-90)
    variables = restore_inference_variables(cfg, model, config_name(args.cfg))

    from sniper_tpu.infer.tester import device_normalize

    @jax.jit
    def fwd(variables, data, im_info):
        data = device_normalize(data, im_info, cfg.network.PIXEL_MEANS)
        return model.apply(variables, data, im_info, train=False)

    tester = Tester(lambda d, i: fwd(variables, d, i), cfg,
                    cfg.dataset.NUM_CLASSES)

    scale_dets = []
    for s in range(len(cfg.TEST.SCALES)):
        batches = TestChipIterator(roidb, cfg, s, 1)
        all_boxes, _ = tester.get_detections(iter(batches), roidb)
        scale_dets.append(all_boxes)
    final = tester.aggregate(scale_dets, 1)

    vis = draw_detections(
        cv2.cvtColor(im, cv2.COLOR_BGR2RGB),
        [final[j][0] for j in range(len(final))],
        COCO_CLASSES if cfg.dataset.NUM_CLASSES == 81 else None,
        threshold=0.5,
    )
    cv2.imwrite(args.out_path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()
