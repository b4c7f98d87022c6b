"""Large-canvas breakdown at the bench configuration (b4, 1408x1920).

After the per-scale roi-count fix the large canvas owns the round
(2 x 174 ms of ~410; 16.5% MFU) — this attributes its step to
trunk-C4 / +deformable-C5 / +RPN+proposal / +head, ascending-canvas
warmup order (the TPU worker crashes if the largest program compiles
first).

  python scripts/profile_large_canvas.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, fetch, n=6):
    np.asarray(fetch(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fetch(fn(*args)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.detector import SNIPERDetector
    from sniper_tpu.models.heads import RPNHead
    from sniper_tpu.models.resnet import ResNetTrunk
    from sniper_tpu.ops.proposals import anchors_ahw_on_device, multi_proposal

    rng = np.random.RandomState(0)

    class TrunkOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ResNetTrunk(units=(3, 4, 23, 3), dtype=jnp.bfloat16,
                               name="trunk")(x, train=False)

    class TrunkRPNProp(nn.Module):
        post_nms: int = 300

        @nn.compact
        def __call__(self, x, im_info):
            c4, c5 = ResNetTrunk(units=(3, 4, 23, 3), dtype=jnp.bfloat16,
                                 name="trunk")(x, train=False)
            feat = jnp.concatenate(
                [c4.astype(jnp.bfloat16), c5.astype(jnp.bfloat16)], -1
            )
            cls, bbox = RPNHead(21, dtype=jnp.bfloat16, name="rpn")(feat)
            fg = jax.nn.softmax(cls, axis=3)[..., 1, :].transpose(0, 3, 1, 2)
            anchors = anchors_ahw_on_device(
                x.shape[1] // 16, x.shape[2] // 16, 16,
                (0.5, 1, 2), (2, 4, 7, 10, 13, 16, 24),
            )
            return multi_proposal(fg, bbox, im_info, anchors,
                                  pre_nms=6000, post_nms=self.post_nms)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    t_only = TrunkOnly()
    t_prop = TrunkRPNProp()
    full = SNIPERDetector(
        num_classes=81, num_anchors=21,
        anchor_scales=(2, 4, 7, 10, 13, 16, 24), anchor_ratios=(0.5, 1, 2),
        units=(3, 4, 23, 3), dtype=jnp.bfloat16,
        pre_nms_top_n=6000, post_nms_top_n=300,
        pool_kernel="fused" if on_tpu else "einsum",
    )

    f_only = jax.jit(lambda v, x: t_only.apply(v, x))
    f_prop = jax.jit(lambda v, x, ii: t_prop.apply(v, x, ii))
    f_full = jax.jit(lambda v, x, ii: full.apply(v, x, ii, train=False))

    # ascending canvas order; warm small sizes first
    for (ch, cw), b in [((384, 512), 8), ((1408, 1920), 4)]:
        data = jnp.asarray(rng.randn(b, ch, cw, 3).astype(np.float32))
        im_info = jnp.asarray(
            np.tile([[ch, cw, 2.9]], (b, 1)).astype(np.float32))

        v1 = t_only.init({"params": jax.random.PRNGKey(0)}, data)
        ta = bench(f_only, (v1, data), lambda o: o[1][0, 0, 0, 0])
        v2 = t_prop.init({"params": jax.random.PRNGKey(0)}, data, im_info)
        tb = bench(f_prop, (v2, data, im_info), lambda o: o[0][0, 0, 0])
        v3 = full.init({"params": jax.random.PRNGKey(0)}, data, im_info,
                       train=False)
        tc = bench(f_full, (v3, data, im_info),
                   lambda o: o["cls_prob"][0, 0, 0])
        print(
            f"canvas {ch}x{cw} b{b}: trunk {ta:7.1f}ms  "
            f"+rpn+proposal {tb:7.1f}ms  full {tc:7.1f}ms  "
            f"(rpn+proposal {tb - ta:6.1f}ms, head {tc - tb:6.1f}ms)",
            flush=True,
        )

        # trunk-internal split: stem+C2-C4 vs deformable C5 — time a
        # trunk with C5's deformable convs swapped for plain dilated
        # convs (same FLOPs through the MXU, no gather/im2col)
        class TrunkPlainC5(nn.Module):
            @nn.compact
            def __call__(self, x):
                return ResNetTrunk(units=(3, 4, 23, 3), dtype=jnp.bfloat16,
                                   deform_c5=False, name="trunk")(
                    x, train=False)

        try:
            t_plain = TrunkPlainC5()
            v4 = t_plain.init({"params": jax.random.PRNGKey(0)}, data)
            td = bench(jax.jit(lambda v, x: t_plain.apply(v, x)),
                       (v4, data), lambda o: o[1][0, 0, 0, 0])
            print(f"  trunk with plain (non-deformable) C5: {td:7.1f}ms "
                  f"-> deform overhead {ta - td:6.1f}ms", flush=True)
        except Exception as e:  # trunk may not expose the switch
            print(f"  (no plain-C5 trunk switch: {type(e).__name__})",
                  flush=True)


if __name__ == "__main__":
    main()
