"""Multi-chip dry-run: shard_map over the 8-device virtual mesh with psum
loss/gradient reductions through batched differentiable solves (the MPC
auto-tuning communication pattern; collectives ride the mesh axis)."""

import pytest
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subset():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
