"""Multi-device TRAINING coverage beyond the driver's tiny dryrun.

The driver validates dryrun_multichip(8) at units (1,1,1,1) / 64^2;
this file runs the mid-depth variant — units (1,2,2,1) at 128^2 chips —
so multi-block residual stages (strided projection + identity blocks)
and a 4x canvas go through the full DP train step on the virtual
8-device mesh. Asserts live inside dryrun_multichip (finite loss).
"""

import pytest


@pytest.mark.slow
def test_dryrun_mid_depth_8dev():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8, "mid")
