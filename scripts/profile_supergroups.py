"""A/B the ResNeXt grouped-3x3 formulations on the real TPU.

The shipped round-4 fix for the x101 grouped-conv layout pathology
(models/resnext.py: XLA lane-pads the width-4 grouped intermediate
32x -> HBM OOM) was the FULL block-diagonal dense expansion — correct,
but it pays 64x the grouped conv's FLOPs. The supergroup middle ground
(feature_group_count=SG over SG lane-aligned channel blocks,
block-diagonal within each) pays 64/SG x with every tensor still
[B,H,W,f/SG>=128]-clean. This script measures the full x101 detector
at the three bench canvases (same shapes/batches as `bench.py x101`)
plus the trunk at the 16x512^2 train shape, for SG in {1, 2, 4} —
the winner ships as the registry default (network.RESNEXT_SUPERGROUPS).

  python scripts/profile_supergroups.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (canvas_h, canvas_w, batch, im_h, im_w, scale, post_nms) — the
# bench.py x101 scale specs for a 640x480 source image under the
# flagship yml TEST.SCALES/BATCH_IMAGES/N_PROPOSAL_PER_SCALE
SPECS = [
    (512, 640, 8, 480, 640, 1.0, 100),
    (832, 1088, 8, 800, 1067, 800 / 480, 200),
    (1408, 1920, 4, 1400, 1867, 1400 / 480, 300),
]
SGS = (1, 2, 4)


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.registry import default_pool_kernel

    rng = np.random.RandomState(0)

    def make_model(sg, post_nms):
        return SNIPERDetector(
            num_classes=81, num_anchors=21,
            anchor_scales=(2, 4, 7, 10, 13, 16, 24),
            anchor_ratios=(0.5, 1, 2), dtype=jnp.bfloat16,
            trunk_type="resnext", units=(3, 4, 23, 3),
            num_trunk_groups=64, trunk_supergroups=sg,
            pre_nms_top_n=6000, post_nms_top_n=post_nms,
            pool_kernel=default_pool_kernel(),
        )

    results: dict = {}
    variables = None
    # ascending canvas size, inputs created right before each warmup
    # (any other order crashes this TPU worker — see bench.py)
    for ch, cw, b, h, w, s, post_nms in SPECS:
        data = jnp.asarray(rng.randn(b, ch, cw, 3).astype(np.float32))
        im_info = jnp.asarray(
            np.tile([[h, w, s]], (b, 1)).astype(np.float32))
        for sg in SGS:
            model = make_model(sg, post_nms)
            if variables is None:
                variables = model.init(
                    {"params": jax.random.PRNGKey(0)}, data, im_info,
                    train=False,
                )  # param tree is IDENTICAL across SG (formulation
                # switch only) — init once, reuse everywhere

            @jax.jit
            def fn(variables, data, im_info, model=model):
                out = model.apply(variables, data, im_info, train=False)
                return out["cls_prob"]

            print(f"warmup {ch}x{cw} SG={sg} ...", file=sys.stderr,
                  flush=True)
            np.asarray(fn(variables, data, im_info))
            t0 = time.perf_counter()
            iters = 6
            for _ in range(iters):
                out = fn(variables, data, im_info)
            np.asarray(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            results[f"{ch}x{cw}_b{b}_sg{sg}_ms"] = round(ms, 1)
            print(f"{ch}x{cw} b{b} SG={sg}: {ms:.1f} ms "
                  f"({b / ms * 1e3:.2f} img/s)", flush=True)

    # trunk-only at the 16x512^2 train shape (train=False forward:
    # the grouped 3x3's cost is identical in either BN pass)
    from sniper_tpu.models.resnext import ResNeXtTrunk

    data = jnp.asarray(rng.randn(16, 512, 512, 3).astype(np.float32))
    tvars = None
    for sg in SGS:
        trunk = ResNeXtTrunk(units=(3, 4, 23, 3), num_groups=64,
                             supergroups=sg, dtype=jnp.bfloat16)
        if tvars is None:
            tvars = trunk.init({"params": jax.random.PRNGKey(0)}, data,
                               train=False)

        @jax.jit
        def tf(vs, data, trunk=trunk):
            c4, c5 = trunk.apply(vs, data, train=False)
            return c5.sum()

        np.asarray(tf(tvars, data))
        t0 = time.perf_counter()
        for _ in range(6):
            out = tf(tvars, data)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / 6 * 1e3
        results[f"trunk_train16x512_sg{sg}_ms"] = round(ms, 1)
        print(f"trunk 16x512^2 SG={sg}: {ms:.1f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
