"""Ablate trunk vs deformable-C5 vs heads on the real TPU.

  python scripts/profile_trunk.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    np.asarray(jax_tree_leaf(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax_tree_leaf(out))
    return (time.perf_counter() - t0) / iters * 1e3


def jax_tree_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.heads import RCNNHead, RPNHead
    from sniper_tpu.models.resnet import ResNetTrunk

    rng = np.random.RandomState(0)
    results = {}
    b, h, w = 2, 832, 1088
    if len(sys.argv) == 4:
        b, h, w = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))

    for tag, deform in [("trunk_deform", True), ("trunk_nodeform", False)]:
        trunk = ResNetTrunk(units=(3, 4, 23, 3), deform_c5=deform,
                            dtype=jnp.bfloat16)
        vs = trunk.init({"params": jax.random.PRNGKey(0)}, data, train=False)

        @jax.jit
        def f(vs, data, trunk=trunk):
            c4, c5 = trunk(vs, data, train=False) if False else \
                trunk.apply(vs, data, train=False)
            return c5.sum()

        ms = timeit(f, vs, data)
        results[tag] = round(ms, 1)
        print(f"{tag}: {ms:.1f} ms", flush=True)

    # heads on a fake C4||C5 feature map
    fh, fw = h // 16, w // 16
    feat = jnp.asarray(rng.randn(b, fh, fw, 3072).astype(np.float32))
    rpn = RPNHead(21)
    vs_rpn = rpn.init({"params": jax.random.PRNGKey(0)}, feat)

    @jax.jit
    def f_rpn(vs, feat):
        a, bb = rpn.apply(vs, feat)
        return a.sum() + bb.sum()

    ms = timeit(f_rpn, vs_rpn, feat)
    results["rpn_head"] = round(ms, 1)
    print(f"rpn_head: {ms:.1f} ms", flush=True)

    rois = np.zeros((b * 300, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(b), 300)
    rois[:, 1] = rng.uniform(0, w - 100, b * 300)
    rois[:, 2] = rng.uniform(0, h - 100, b * 300)
    rois[:, 3] = rois[:, 1] + rng.uniform(16, 100, b * 300)
    rois[:, 4] = rois[:, 2] + rng.uniform(16, 100, b * 300)
    feat256 = jnp.asarray(rng.randn(b, fh, fw, 256).astype(np.float32))
    head = RCNNHead(81, spatial_scale=1.0 / 16)
    vs_head = head.init({"params": jax.random.PRNGKey(0)}, feat256,
                        jnp.asarray(rois))

    @jax.jit
    def f_head(vs, feat, rois):
        c, bb = head.apply(vs, feat, rois)
        return c.sum() + bb.sum()

    ms = timeit(f_head, vs_head, feat256, jnp.asarray(rois))
    results["rcnn_head_600rois"] = round(ms, 1)
    print(f"rcnn_head (600 rois): {ms:.1f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
