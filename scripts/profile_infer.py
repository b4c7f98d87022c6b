"""Per-stage inference profiling on the real TPU.

Times, per test scale: trunk+RPN only, +proposal(NMS), full model.
Isolates whether the gap vs baseline is conv FLOPs, the sequential NMS
loop, or the gather-heavy ROI head.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(jax.block_until_ready, out)
    return (time.perf_counter() - t0) / n


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.heads import RPNHead
    from sniper_tpu.models.resnet import ResNetTrunk
    from sniper_tpu.ops.proposals import anchors_ahw_on_device, multi_proposal

    rng = np.random.RandomState(0)
    im_w, im_h = 640, 480
    specs = []
    for (lo, hi), b in zip([(1400, 2000), (800, 1280), (480, 512)], [2, 2, 4]):
        s = lo / min(im_w, im_h)
        if round(s * max(im_w, im_h)) > hi:
            s = hi / max(im_w, im_h)
        h = (int(np.round(im_h * s)) + 63) // 64 * 64
        w = (int(np.round(im_w * s)) + 63) // 64 * 64
        specs.append((h, w, b, s))

    model = SNIPERDetector(
        num_classes=81, num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
    )

    class TrunkRPN(nn.Module):
        @nn.compact
        def __call__(self, x):
            c4, c5 = ResNetTrunk(units=(3, 4, 23, 3), dtype=jnp.bfloat16,
                                 name="trunk")(x, train=False)
            feat = jnp.concatenate(
                [c4.astype(jnp.float32), c5.astype(jnp.float32)], -1
            )
            return RPNHead(21, name="rpn")(feat)

    trunk = TrunkRPN()

    for h, w, b, s in specs:
        data = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        im_info = jnp.asarray(np.tile([[h, w, s]], (b, 1)).astype(np.float32))

        tv = trunk.init({"params": jax.random.PRNGKey(0)}, data)

        @jax.jit
        def trunk_fn(tv, data):
            return trunk.apply(tv, data)

        t_trunk = timeit(trunk_fn, tv, data)

        @jax.jit
        def prop_fn(tv, data, im_info):
            cls, bbox = trunk.apply(tv, data)
            fg = jax.nn.softmax(cls, axis=3)[..., 1, :].transpose(0, 3, 1, 2)
            anchors = anchors_ahw_on_device(
                data.shape[1] // 16, data.shape[2] // 16, 16,
                (0.5, 1, 2), (2, 4, 7, 10, 13, 16, 24),
            )
            return multi_proposal(fg, bbox, im_info, anchors)

        t_prop = timeit(prop_fn, tv, data, im_info)

        mv = model.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                        train=False)

        @jax.jit
        def full_fn(mv, data, im_info):
            return model.apply(mv, data, im_info, train=False)

        t_full = timeit(full_fn, mv, data, im_info)
        print(
            f"canvas {h}x{w} b{b}: trunk+rpn {t_trunk*1e3:8.1f}ms  "
            f"+proposal {t_prop*1e3:8.1f}ms  full {t_full*1e3:8.1f}ms  "
            f"({b / t_full:5.2f} img/s this scale)",
            flush=True,
        )


if __name__ == "__main__":
    main()
