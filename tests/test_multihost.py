"""Multi-host (multi-process) distribution tests.

The reference only runs multi-node under real torchrun+NCCL (SURVEY.md §4:
no fake backend exists there). Here the jax.distributed runtime is exercised
for real with 2 OS processes x 4 virtual CPU devices via
tools/dryrun_multihost.py, asserting the global-mesh train step matches the
single-process loss exactly and that checkpoint IO is rank-0-gated.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_dryrun_two_processes():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout[out.stdout.index("{"):])
    assert report["ok"]
    assert report["max_loss_diff"] < 1e-5
    assert report["main_process_ckpt_written"]


def test_single_process_distributed_helpers():
    """The helpers must degrade gracefully without an initialized runtime."""
    from video_styler_tpu.parallel import distributed as D
    assert D.is_main_process()
    assert not D.is_distributed()
    assert D.broadcast_object({"seed": 7}) == {"seed": 7}
    D.sync_processes()  # no-op single process


def test_make_global_mesh_axes():
    from video_styler_tpu.parallel import distributed as D
    mesh = D.make_global_mesh(dp=2, fsdp=2, sp=2)
    assert mesh.shape == {"dp": 2, "fsdp": 2, "sp": 2}
    with pytest.raises(ValueError):
        D.make_global_mesh(dp=16, fsdp=16, sp=16)
