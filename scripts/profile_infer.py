"""Decompose inference step time on the real TPU.

Times standalone jitted pieces of the test-mode forward at a
representative small canvas (where MFU is worst) to find the
canvas-independent overhead: trunk-only, RPN decode+topk (no NMS),
greedy-NMS loop alone, deformable ROI head alone, and the full model.

  python scripts/profile_infer.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    np.asarray(fn(*args))  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.ops.nms import nms_jax
    from sniper_tpu.ops.proposals import (
        anchors_ahw_on_device,
        multi_proposal,
    )

    results = {}
    rng = np.random.RandomState(0)

    # full model on the small (worst-MFU) canvas and the large one
    model = SNIPERDetector(
        num_classes=81, num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
        pre_nms_top_n=6000, post_nms_top_n=300,
    )

    @jax.jit
    def full(variables, data, im_info):
        return model.apply(variables, data, im_info, train=False)["rois"]

    shapes = [(4, 384, 512), (2, 832, 1088)]
    variables = None
    for b, h, w in shapes:
        data = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        im_info = jnp.asarray(
            np.tile([[h, w, 1.0]], (b, 1)).astype(np.float32))
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(0)}, data,
                                   im_info, train=False)
        ms = timeit(full, variables, data, im_info)
        results[f"full_{h}x{w}_b{b}"] = round(ms, 1)
        print(f"full {h}x{w} b{b}: {ms:.1f} ms", flush=True)

    # proposal op alone (decode + topk + NMS) at the small canvas
    b, h, w = 4, 384, 512
    fh, fw = h // 16, w // 16
    A = 21
    anchors = anchors_ahw_on_device(fh, fw, 16, (0.5, 1, 2),
                                    (2, 4, 7, 10, 13, 16, 24))
    fg = jnp.asarray(rng.rand(b, A, fh, fw).astype(np.float32))
    dl = jnp.asarray((rng.randn(b, 4 * A, fh, fw) * 0.1).astype(np.float32))
    ii = jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)).astype(np.float32))

    @jax.jit
    def prop(fg, dl, ii, anchors):
        return multi_proposal(fg, dl, ii, anchors, pre_nms=6000,
                              post_nms=300, thresh=0.7)[0]

    ms = timeit(prop, fg, dl, ii, anchors)
    results["multi_proposal_b4"] = round(ms, 1)
    print(f"multi_proposal b4 (decode+topk+NMS): {ms:.1f} ms", flush=True)

    # greedy NMS loop alone, batched like the model (vmap over 4 images)
    boxes = rng.rand(b, 6000, 4).astype(np.float32) * 300
    boxes[..., 2:] += boxes[..., :2]
    scores = rng.rand(b, 6000).astype(np.float32)

    @jax.jit
    def nms_only(boxes, scores):
        return jax.vmap(lambda bx, sc: nms_jax(bx, sc, 300, 0.7)[0])(
            boxes, scores)

    ms = timeit(nms_only, jnp.asarray(boxes), jnp.asarray(scores))
    results["nms_loop_b4"] = round(ms, 1)
    print(f"greedy NMS loop b4 (300 iters over 6000): {ms:.1f} ms",
          flush=True)

    # topk alone
    @jax.jit
    def topk_only(scores):
        return jax.lax.top_k(scores.reshape(b, -1), 6000)[0]

    big_scores = jnp.asarray(rng.rand(b, A * fh * fw).astype(np.float32))
    ms = timeit(topk_only, big_scores)
    results["topk_b4"] = round(ms, 1)
    print(f"top_k 6000 b4: {ms:.1f} ms", flush=True)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
