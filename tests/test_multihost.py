"""Two-process DCN dryrun (VERDICT round-2 item 8): the frame batch shards
ACROSS process boundaries through jax.distributed + a localhost coordination
service, each process feeds only its local rows, and the all-gathered global
loss must agree between processes.  The parent/child plumbing lives in
__graft_entry__.dryrun_multihost; this test just exercises it.
"""

import sys

import pytest

pytestmark = pytest.mark.e2e


def test_two_process_dcn_dryrun():
    sys.path.insert(0, ".")
    import __graft_entry__

    # raises on child failure or cross-process loss disagreement
    __graft_entry__.dryrun_multihost(n_processes=2, n_local_devices=2)
