"""Worker for the real multi-process integration test (not a test module).

Launched twice by tests/test_multiprocess.py: each process owns 4 virtual
CPU devices, joins a 2-process jax.distributed cluster (gloo CPU
collectives), runs the REAL sharded train step on a {data:4, fsdp:2}
global mesh, orbax-saves/restores across processes, and prints losses
for the parent to compare against an in-process single-process run of
the same batch+seeds. This exercises what the in-process mesh tests
cannot: jax.distributed.initialize, cross-process collectives,
make_array_from_callback addressable-shard assembly, and multi-process
orbax save/restore — the reference's DDP+NCCL territory
(reference train.py:220, utils.py:84-94).

Usage: mp_worker.py <process_id> <num_processes> <port> <ckpt_dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> None:
    pid, nproc, port, ckpt_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

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
    from maskdit_tpu.utils.ckpt import CheckpointManager

    model = create_model(
        "edm", img_resolution=16, img_channels=4, num_classes=16,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=8)
    mesh = create_mesh({"data": 4, "fsdp": 2})
    # DCN-aware placement (VERDICT r3 next #8): 'data' spans the two
    # processes; every fsdp pair stays INSIDE one process so per-layer
    # parameter gathers never cross the (simulated) DCN boundary.
    darr = mesh.devices
    assert {d.process_index for d in darr.flat} == set(range(nproc))
    for i in range(darr.shape[0]):
        row_procs = {d.process_index for d in darr[i].flat}
        assert len(row_procs) == 1, (
            f"fsdp group {i} straddles processes: {row_procs}"
        )
    print("placement=ok", flush=True)
    with mesh:
        state, shardings = create_sharded_state(
            model, jax.random.PRNGKey(0), opt, mesh, batch_size=2
        )
        step = make_sharded_train_step(
            model, opt, mesh, shardings, donate=False,
            mask_ratio=0.5, mae_loss_coef=0.1, class_dropout_prob=0.1,
            grad_accum=2, log_grad_norm=False,
        )

        # identical global batch on every process; each device's shard is
        # sliced by index in the callback (process-layout-proof)
        rng = jax.random.PRNGKey(7)
        gx = np.asarray(jax.random.normal(rng, (8, 8, 16, 16)))
        gy = np.asarray(jax.nn.one_hot(jnp.arange(8) % 16, 16))
        dsh = batch_sharding(mesh)
        batch = {
            "x": jax.make_array_from_callback(
                gx.shape, dsh, lambda idx: gx[idx]
            ),
            "y": jax.make_array_from_callback(
                gy.shape, dsh, lambda idx: gy[idx]
            ),
        }

        state, m1 = step(state, batch, jax.random.PRNGKey(1))
        print(f"loss1={float(jax.device_get(m1['loss'])):.6f}", flush=True)

        mgr = CheckpointManager(ckpt_dir)
        mgr.save(int(jax.device_get(state.step)), state)
        mgr.wait()

        state2 = mgr.restore(jax.tree.map(lambda x: x, state))
        state2, m2 = step(state2, batch, jax.random.PRNGKey(2))
        print(f"loss2={float(jax.device_get(m2['loss'])):.6f}", flush=True)

        # global param checksum (replicated output -> equal on every proc)
        total = jax.jit(
            lambda s: sum(jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(s)),
        )(state2.params)
        print(f"checksum={float(jax.device_get(total)):.6f}", flush=True)
        mgr.close()


if __name__ == "__main__":
    main()
