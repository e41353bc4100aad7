"""Multi-HOST data-parallel dryrun: 2 `jax.distributed` CPU processes × 4
devices each, one real train step over the global mesh with per-process data
loading (role of the reference's DDP spawn + DistributedSampler,
`train.py:727-736`, `base_dataset.py:166-169` — never CI-tested there).

Asserts per-process dataset shards are disjoint + covering and that the
replicated loss / updated-param norm agree bit-exactly across processes.

Then each process runs the REAL `training()` loop against shared storage:
2 epochs with per-epoch checkpoints, then `--restore` + 1 more epoch —
asserting rank-0-only side effects (exactly one checkpoint writer, reference
train.py:407-429,592-635) and bit-identical restored/final params on both
processes.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


@pytest.mark.multihost
@pytest.mark.slow
def test_dryrun_multihost_2proc():
    import __graft_entry__ as g

    g.dryrun_multihost(n_devices=8, n_processes=2)
