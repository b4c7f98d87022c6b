"""Part-wise timing with forced-transfer sync: trunk / +rpn+proposal /
+roi-head, per test scale."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_fn(fn, args, fetch, n=5):
    out = fn(*args)
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(fetch(out))
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

    class TrunkOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ResNetTrunk(units=(3, 4, 23, 3), dtype=jnp.bfloat16,
                               name="trunk")(x, train=False)

    class TrunkRPNProp(nn.Module):
        @nn.compact
        def __call__(self, x, im_info):
            c4, c5 = ResNetTrunk(units=(3, 4, 23, 3), dtype=jnp.bfloat16,
                                 name="trunk")(x, train=False)
            feat = jnp.concatenate(
                [c4.astype(jnp.float32), c5.astype(jnp.float32)], -1
            )
            cls, bbox = RPNHead(21, name="rpn")(feat)
            fg = jax.nn.softmax(cls, axis=3)[..., 1, :].transpose(0, 3, 1, 2)
            anchors = anchors_ahw_on_device(
                x.shape[1] // 16, x.shape[2] // 16, 16,
                (0.5, 1, 2), (2, 4, 7, 10, 13, 16, 24),
            )
            return multi_proposal(fg, bbox, im_info, anchors)

    t_only = TrunkOnly()
    t_prop = TrunkRPNProp()
    full = SNIPERDetector(
        num_classes=81, num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
    )

    f_only = jax.jit(lambda v, x: t_only.apply(v, x))
    f_prop = jax.jit(lambda v, x, ii: t_prop.apply(v, x, ii))
    f_full = jax.jit(lambda v, x, ii: full.apply(v, x, ii, train=False))

    for (lo, hi), b in zip([(1400, 2000), (480, 512)], [2, 4]):
        s = lo / min(im_w, im_h)
        if round(s * max(im_w, im_h)) > hi:
            s = hi / max(im_w, im_h)
        h = (int(np.round(im_h * s)) + 63) // 64 * 64
        w = (int(np.round(im_w * s)) + 63) // 64 * 64
        data = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        im_info = jnp.asarray(np.tile([[h, w, s]], (b, 1)).astype(np.float32))

        v1 = t_only.init({"params": jax.random.PRNGKey(0)}, data)
        ta = bench_fn(f_only, (v1, data), lambda o: o[1][0, 0, 0, 0])

        v2 = t_prop.init({"params": jax.random.PRNGKey(0)}, data, im_info)
        tb = bench_fn(f_prop, (v2, data, im_info), lambda o: o[0][0, 0, 0])

        v3 = full.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                       train=False)
        tc = bench_fn(f_full, (v3, data, im_info),
                      lambda o: o["cls_prob"][0, 0, 0])

        print(
            f"canvas {h}x{w} b{b}: trunk {ta*1e3:7.1f}ms  "
            f"+rpn+proposal {tb*1e3:7.1f}ms  full {tc*1e3:7.1f}ms  "
            f"(proposal {1e3*(tb-ta):6.1f}ms, head {1e3*(tc-tb):6.1f}ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
