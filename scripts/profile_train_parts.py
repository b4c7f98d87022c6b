"""Part-wise train-step timing on the real TPU: forward-only loss vs
full grad, trunk-with/without deformable C5 grads.

  python scripts/profile_train_parts.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax_leaf(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax_leaf(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def jax_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def main():
    import jax
    import jax.numpy as jnp

    from sniper_tpu.models.resnet import ResNetTrunk

    rng = np.random.RandomState(0)
    b, chip = 16, 512
    data = jnp.asarray(rng.randn(b, chip, chip, 3).astype(np.float32))

    for tag, deform in [("trunk_deform", True), ("trunk_nodeform", False)]:
        trunk = ResNetTrunk(units=(3, 4, 23, 3), deform_c5=deform,
                            dtype=jnp.bfloat16)
        vs = trunk.init({"params": jax.random.PRNGKey(0)}, data, train=False)

        @jax.jit
        def fwd(vs, data, trunk=trunk):
            c4, c5 = trunk.apply(vs, data, train=False)
            return (c5.astype(jnp.float32) ** 2).mean() \
                + (c4.astype(jnp.float32) ** 2).mean()

        @jax.jit
        def bwd(vs, data, trunk=trunk):
            def loss(vs):
                c4, c5 = trunk.apply(vs, data, train=False)
                return (c5.astype(jnp.float32) ** 2).mean() \
                    + (c4.astype(jnp.float32) ** 2).mean()
            l, g = jax.value_and_grad(loss)(vs)
            # touch every grad leaf so XLA can't DCE the backward
            return l + sum(
                jnp.sum(jnp.abs(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(g)
            ) * 1e-30

        tf = timeit(fwd, vs, data)
        tb = timeit(bwd, vs, data)
        print(f"{tag}: fwd {tf:.1f}ms  fwd+bwd {tb:.1f}ms "
              f"(bwd/fwd {tb/tf:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
