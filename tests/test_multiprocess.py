"""REAL multi-process training test (2 jax.distributed processes).

The in-process mesh tests (tests/test_sharded_numerics.py) prove the
sharded math; this one proves the multi-host *machinery* without a pod:
two OS processes with 4 virtual CPU devices each join one
jax.distributed cluster (gloo CPU collectives), run the real sharded
train step on a global {data:4, fsdp:2} mesh, orbax-save/restore across
processes, and must agree with each other AND with a single-process run
of the identical batch+seeds — the TPU analogue of the reference's
DDP-over-NCCL guarantee (reference train.py:220, utils.py:84-94).
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse(out: str) -> dict:
    assert "placement=ok" in out, f"DCN-aware mesh placement failed:\n{out}"
    vals = dict(re.findall(r"(loss1|loss2|checksum)=([-\d.]+)", out))
    assert set(vals) == {"loss1", "loss2", "checksum"}, f"bad output:\n{out}"
    return {k: float(v) for k, v in vals.items()}


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    r0, r1 = (_parse(o) for o in outs)

    # both processes observe the same losses and end in the same state
    for k in ("loss1", "loss2", "checksum"):
        assert abs(r0[k] - r1[k]) < 1e-5, (k, r0, r1)

    # single-process reference on this process's own 8-device mesh:
    # same model/seeds/batch, same {data:4, fsdp:2} topology
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskdit_tpu.models import create_model
    from maskdit_tpu.parallel import create_mesh
    from maskdit_tpu.parallel.mesh import batch_sharding
    from maskdit_tpu.parallel.sharded import (
        create_sharded_state,
        make_sharded_train_step,
    )
    from maskdit_tpu.train.state import make_optimizer

    model = create_model(
        "edm", img_resolution=16, img_channels=4, num_classes=16,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=8)
    mesh = create_mesh({"data": 4, "fsdp": 2})
    with mesh:
        state, shardings = create_sharded_state(
            model, jax.random.PRNGKey(0), opt, mesh, batch_size=2
        )
        step = make_sharded_train_step(
            model, opt, mesh, shardings, donate=False,
            mask_ratio=0.5, mae_loss_coef=0.1, class_dropout_prob=0.1,
            grad_accum=2, log_grad_norm=False,
        )
        rng = jax.random.PRNGKey(7)
        batch = {
            "x": jax.device_put(
                np.asarray(jax.random.normal(rng, (8, 8, 16, 16))),
                batch_sharding(mesh),
            ),
            "y": jax.device_put(
                np.asarray(jax.nn.one_hot(jnp.arange(8) % 16, 16)),
                batch_sharding(mesh),
            ),
        }
        _, m1 = step(state, batch, jax.random.PRNGKey(1))
        ref_loss1 = float(jax.device_get(m1["loss"]))

    assert abs(r0["loss1"] - ref_loss1) < 1e-5, (r0["loss1"], ref_loss1)
