"""End-to-end golden-detections pin: the assembled inference pipeline
must be fp32-exact against the frozen fixture.

tests/fixtures/golden_detections.json was produced by
scripts/gen_golden_detections.py: a PRNGKey(42)-seeded tiny detector
over 3 deterministic synthetic images, run through the FULL 2-scale
chain — per-chip decode/clip/rescale, per-class score filter, per-scale
VALID_RANGES area filters, gaussian soft-NMS rescoring order,
MAX_PER_IMAGE cap (reference /root/reference/lib/inference.py:152-370).
Per-component oracles can't see cross-round drift of the assembled
pipeline; this test does. A mismatch means the pipeline SEMANTICS
changed: if intentional, regenerate the fixture and review the diff.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_detections.json")


# slow set: full 2-scale pipeline vs the frozen fixture (~15s)
@pytest.mark.slow
def test_pipeline_matches_golden_fixture():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import gen_golden_detections as gg

    with open(FIXTURE) as f:
        want = json.load(f)

    final = gg.run_chain()
    assert want["num_classes"] == gg.NUM_CLASSES
    assert want["num_images"] == gg.N_IMAGES

    total = 0
    for c in range(gg.NUM_CLASSES):
        for i in range(gg.N_IMAGES):
            got = np.asarray(final[c][i], np.float32).reshape(-1, 5)
            exp = np.asarray(want["dets"][c][i], np.float32).reshape(-1, 5)
            assert got.shape == exp.shape, (
                f"class {c} image {i}: {got.shape} vs golden {exp.shape}"
            )
            # same emission ORDER too (soft-NMS order-dependence is part
            # of the guarded surface)
            np.testing.assert_allclose(
                got, exp, rtol=1e-5, atol=1e-6,
                err_msg=f"class {c} image {i}",
            )
            total += len(exp)
    assert total > 0, "golden fixture is empty — regenerate it"
