"""train.py driven as a real 2-process cluster (the reference's
multi-node `accelerate launch` workflow, minus the launcher).

Each process runs the actual CLI with --coordinator/--num_processes/
--process_id (reference utils.py:84-94 env-init equivalent) on 4
virtual CPU devices, trains a synthetic-data DiT-S for 4 steps on the
shared {data:8} mesh with gloo collectives, and multi-process
orbax-checkpoints into a shared results dir.
"""

import glob
import os
import socket
import subprocess
import sys

import pytest

from test_trainer import SMOKE_CONFIG


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_train_cli_two_processes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = tmp_path / "smoke.yaml"
    cfg_path.write_text(SMOKE_CONFIG)
    results = tmp_path / "results"
    port = _free_port()

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["MASKDIT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.join(repo, "train.py"),
                "--config", str(cfg_path),
                "--results_dir", str(results),
                "--num_workers", "1",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(i),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-4000:]}"

    # rank 0 logs the run banner; both ranks trained to step 4
    assert "global batch 8" in outs[0], outs[0][-2000:]
    # one shared sharded checkpoint at step 4 exists
    ckpts = glob.glob(str(results / "*" / "checkpoints" / "*"))
    assert any(os.path.basename(c).rstrip("/") == "4" for c in ckpts), ckpts
