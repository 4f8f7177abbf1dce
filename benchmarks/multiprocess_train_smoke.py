"""Two-process smoke of the PRODUCTION trainer (`run_train.py --distributed`).

benchmarks/multiprocess_smoke.py proves the primitive pattern (distributed
init, host_local_slice, make_array_from_process_local_data, one sharded
step) in a bespoke script. This smoke launches the real entry point — the
exact command a TPU pod host would run, minus the explicit coordinator
flags that the TPU plugin auto-detects:

    python run_train.py --distributed --coordinator=H:P \
        --num_processes=2 --process_id=I --synthetic=8 --preset=tiny ...

and asserts the full production loop is pod-correct end-to-end:

- both processes see the 8-device global mesh (4 local CPU devices each);
- each feeds only batch_size/process_count local rows per step
  (parallel.mesh.shard_batch assembles the global batch);
- per-step/epoch printing, stat.json, checkpoints, and mAP eval happen on
  process 0 ONLY;
- the final replicated params fingerprint is bit-identical on both
  processes (the gradient all-reduce really ran across processes);
- a single-process run with the same seed/global-batch reaches the SAME
  fingerprint: pod semantics == single-host semantics (the global batch is
  identical, only who feeds the rows changes).

Run:  python benchmarks/multiprocess_train_smoke.py
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NPROC = 2
DEV_PER_PROC = 4
ARGS = [
    "--synthetic=8", "--preset=tiny", "--batch_size=8", "--max_epoch=2",
    "--seed=0", "--eval_every_k_epochs=2",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_local_dev: int) -> dict:
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH", "JAX_PLATFORMS",
                     "XLA_FLAGS")
    }
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_local_dev}",
    })
    return env


def main() -> int:
    port = _free_port()
    tmp = tempfile.mkdtemp(prefix="mp_train_smoke_")
    log_dir = os.path.join(tmp, "pod")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "run_train.py"),
             "--distributed", f"--coordinator=localhost:{port}",
             f"--num_processes={NPROC}", f"--process_id={i}",
             f"--log_dir={log_dir}"] + ARGS,
            env=_env(DEV_PER_PROC), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NPROC)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        print(f"--- pod proc {i} (rc={p.returncode}) ---\n{out}", flush=True)
        if p.returncode != 0:
            return 1

    fps = [re.search(r"final params_l2=([\d.]+)", o).group(1) for o in outs]
    assert fps[0] == fps[1], f"params diverged across processes: {fps}"
    for o in outs:
        assert "devices=8" in o, "global mesh not assembled"
        assert f"local_rows={8 // NPROC}" in o, "per-process rows wrong"
    # process-0-only side effects
    assert "[epoch 1]" in outs[0] and "mAP0.25" in outs[0]
    assert "[epoch" not in outs[1] and "mAP0.25" not in outs[1]
    assert os.path.exists(os.path.join(log_dir, "stat.json"))
    ckpts = [f for f in os.listdir(log_dir) if f.startswith("checkpoint_")]
    assert ckpts, f"no checkpoint written in {log_dir}"

    # single-process control: same seed + same GLOBAL batch must land on
    # the same params up to float reduction order (the pod assembles the
    # batch as [proc0-slice-perm, proc1-slice-perm] while solo permutes all
    # rows at once — same scene SET per batch, different row order, so the
    # batch-mean reductions sum in a different order)
    solo = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_train.py"),
         f"--log_dir={os.path.join(tmp, 'solo')}"] + ARGS,
        env=_env(NPROC * DEV_PER_PROC), cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    print(f"--- solo (rc={solo.returncode}) ---\n{solo.stdout[-2000:]}", flush=True)
    if solo.returncode != 0:
        return 1
    fp_solo = float(re.search(r"final params_l2=([\d.]+)", solo.stdout).group(1))
    rel = abs(fp_solo - float(fps[0])) / max(abs(fp_solo), 1e-9)
    assert rel < 1e-4, (
        f"pod run != single-process run: {fps[0]} vs {fp_solo} (rel {rel:.2e})"
    )
    print(f"MULTIPROCESS TRAIN SMOKE PASSED: params_l2={fps[0]} identical "
          f"on both pod processes; single-process control within {rel:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
