"""Two-OS-process distributed smoke (slow): see benchmarks/multiprocess_smoke.py.

Spawns two real processes joined by jax.distributed.initialize (Gloo over
localhost — the multi-host pod code path), partitions input with the
production host_local_slice, and runs one sharded train step; the parent
asserts disjoint slices and an identical all-reduced loss on both processes.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fast_broadcast_resume_two_process():
    """FAST-lane coverage of the broadcast-resume path (VERDICT r4 #7):
    2 processes x 1 device, checkpoint baked in-process, ONE pod launch
    that must restore on process 0 and broadcast over the mesh. The full
    trained-checkpoint + dp x sp rehearsal stays in the slow lane below."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH", "JAX_PLATFORMS",
                     "XLA_FLAGS", "SMOKE_PORT")
    }
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "multiprocess_train_smoke.py"),
         "--fast_resume"],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "RESUME PHASE PASSED" in r.stdout


@pytest.mark.slow
def test_two_process_train_step():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH", "JAX_PLATFORMS",
                     "XLA_FLAGS", "SMOKE_PORT")
    }
    # The smoke parent picks a free coordinator port itself.  Distributed
    # init over localhost can still flake under full-suite load (coordinator
    # handshake timeout), so allow one retry before declaring failure.
    for attempt in (0, 1):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "benchmarks", "multiprocess_smoke.py")],
            env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        if r.returncode == 0:
            break
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "MULTIPROCESS SMOKE PASSED" in r.stdout


@pytest.mark.slow
def test_four_process_dpxsp_broadcast_resume():
    """4-process production-trainer rehearsal on a (data=4, points=2) mesh:
    dp x sp pod semantics, process-0-only side effects, and checkpoint
    resume WITHOUT a shared filesystem (restore on process 0, broadcast
    over the mesh) — VERDICT r3 #5. Wraps
    benchmarks/multiprocess_train_smoke.py --nproc=4 --spmesh
    --resume_phase; a persistent JAX compile cache (set inside the smoke)
    keeps reruns tractable on a 1-core host."""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH", "JAX_PLATFORMS",
                     "XLA_FLAGS", "SMOKE_PORT")
    }
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "multiprocess_train_smoke.py"),
         "--nproc=4", "--dev_per_proc=2", "--spmesh", "--resume_phase"],
        env=env, capture_output=True, text=True, timeout=3000, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "RESUME PHASE PASSED" in r.stdout
    assert "MULTIPROCESS TRAIN SMOKE PASSED: nproc=4 spmesh=True" in r.stdout
