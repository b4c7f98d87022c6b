"""Pallas NMS kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

from sniper_tpu.ops.nms import nms_np
from tests.conftest import random_boxes


def test_pallas_nms_matches_reference(rng):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from sniper_tpu.ops.pallas.nms import nms_pallas

    dets = random_boxes(rng, 100, hw=(256, 256))
    with pltpu.force_tpu_interpret_mode():
        keep, valid = nms_pallas(
            jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 64, 0.5
        )
    got = [int(k) for k, v in zip(np.asarray(keep), np.asarray(valid)) if v]
    assert got == nms_np(dets, 0.5)[:64]
