"""Train-step golden pin: 3 SGD steps of the full train plane must
reproduce the frozen per-step loss trajectory.

tests/fixtures/golden_train.json was produced by
scripts/gen_golden_train.py: a seeded tiny detector with all six losses
live (rpn_cls / rpn_bbox / rcnn_cls / rcnn_bbox / focus / mask), a
deterministic batch built through the real AnchorTargetAssigner (sparse
ChipLoader form) + L-shaped rasterized masks, stepped 3x by the real
make_train_step (warmup LR ramp active) on CPU fp32. The inference
plane has test_golden_detections; this is the same pin for the train
plane — loss normalizations (valid-count CE, RPN 3/(B*RPN_BATCH), RCNN
1/(188*B)), the fused sampler, and the warmup-LR arithmetic (reference
/root/reference/symbols/faster/resnet_mx_101_e2e.py:279-319) all feed
these seven numbers. A mismatch means the train-step SEMANTICS changed:
if intentional, regenerate the fixture and review the diff.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_train.json")


# slow set: compiles the full fp32 train step on CPU (~2 min)
@pytest.mark.slow
def test_train_step_matches_golden_fixture():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import gen_golden_train as gg

    with open(FIXTURE) as f:
        want = json.load(f)
    assert want["n_steps"] == gg.N_STEPS
    assert tuple(want["loss_keys"]) == gg.LOSS_KEYS

    got = gg.run_steps()
    for i, (g, w) in enumerate(zip(got, want["steps"])):
        for k in gg.LOSS_KEYS:
            np.testing.assert_allclose(
                g[k], w[k], rtol=1e-5, atol=1e-6,
                err_msg=f"step {i} {k}",
            )
    # the fixture itself must be non-degenerate: every loss component
    # live at step 0 (a zero mask/focus loss would mean that head
    # silently dropped out of the golden's coverage)
    for k in gg.LOSS_KEYS:
        assert want["steps"][0][k] > 0, f"degenerate golden: {k} == 0"
