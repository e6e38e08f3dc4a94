"""Multi-chip correctness proofs (VERDICT r2 missing #2/#3).

The reference's DDP guarantees each rank is an exact replica — gradient
all-reduce makes multi-GPU math equal single-GPU math by construction
(reference: train.py:220). These tests pin the same guarantee onto the
dp/fsdp/tp sharded step, and pin elastic resume across topology changes
(the scenario the preemption handler exists for, which the reference
sidesteps via rank-0 torch.save / train.py:259-271):

* sharded (2x2x2) step output == unsharded step output, same batch+seeds;
* a checkpoint saved from a {data:2,fsdp:2,tensor:2} layout restores onto
  a {data:8} layout and training continues.

All on the 8-device virtual CPU mesh from tests/conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskdit_tpu.models import create_model
from maskdit_tpu.parallel import create_mesh
from maskdit_tpu.parallel.sharded import (
    create_sharded_state,
    make_sharded_train_step,
)
from maskdit_tpu.train.state import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _tiny_model():
    return create_model(
        "edm", img_resolution=16, img_channels=4, num_classes=16,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )


def _batch(n):
    rng = jax.random.PRNGKey(7)
    return {
        "x": jax.random.normal(rng, (n, 8, 16, 16)),  # VAE moments
        "y": jax.nn.one_hot(jnp.arange(n) % 16, 16),
    }


STEP_KW = dict(
    mask_ratio=0.5, mae_loss_coef=0.1, class_dropout_prob=0.1,
    grad_accum=2, log_grad_norm=False,
)


def _collective_bytes(hlo: str) -> dict:
    """Per-kind result bytes of every collective in optimized HLO."""
    import re

    out: dict = {}
    for line in hlo.splitlines():
        if "-done(" in line:  # repeats the -start tuple type
            continue
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            if f" {op}(" not in line and f" {op}-start(" not in line:
                continue
            head = line.split("=", 1)
            # result may be a variadic TUPLE "(f32[...], f32[...])": take
            # everything between '=' and the op token, parens included
            typestr = (
                head[1].split(f" {op}")[0] if len(head) == 2 else line
            )
            n_bytes = 0
            for dt, dims in re.findall(r"(bf16|f32)\[([\d,]*)\]", typestr):
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                n_bytes += n * (2 if dt == "bf16" else 4)
            out[op] = out.get(op, 0) + n_bytes
    return out


def test_accum_microbatch_stays_sharded(tiny_dit):
    """GSPMD loses the batch sharding at the (N,)->(ga, micro) accum
    reshape and replicates the micro-batches, turning weight matmuls into
    full-activation all-reduces (604 MB fp32 per fc1 per micro at XL/2 —
    found by tools/xl_shard_report.py). make_sharded_train_step now
    re-anchors the sharding with an explicit constraint; this pins (a)
    unchanged numerics and (b) a large drop in all-reduced bytes."""
    mesh = create_mesh({"data": 2, "fsdp": 2}, devices=jax.devices()[:4])
    model = _tiny_model()
    opt = make_optimizer(1e-4, global_batch_size=16)
    batch = _batch(16)
    rng = jax.random.PRNGKey(3)

    results, hlo_bytes = [], {}
    for constrained in (True, False):
        with mesh:
            state, shardings = create_sharded_state(
                model, jax.random.PRNGKey(0), opt, mesh, batch_size=2
            )
            kw = dict(STEP_KW, grad_accum=4)
            if not constrained:
                kw["microbatch_sharding"] = None  # explicit opt-out
            step = make_sharded_train_step(
                model, opt, mesh, shardings, donate=False, **kw
            )
            sharded_batch = {
                k: jax.device_put(
                    v, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec(("data", "fsdp"))
                    )
                ) for k, v in batch.items()
            }
            hlo_bytes[constrained] = _collective_bytes(
                step.lower(state, sharded_batch, rng).compile().as_text()
            )
            _, metrics = step(state, sharded_batch, rng)
            results.append(float(jax.device_get(metrics["loss"])))

    assert np.isfinite(results[0])
    np.testing.assert_allclose(results[0], results[1], rtol=2e-5)
    # measured on this mesh (tuple-aware byte parser): constrained keeps
    # ONLY the gradient-sync all-reduce (1.52 MB here) — the activation
    # resharding collective-permutes disappear entirely and all-reduce
    # volume drops ~40% (the removed part is the replicated-micro
    # activation reduces; at XL/2 scale those were 604 MB fp32 per fc1
    # per micro). Pin both signatures.
    assert "collective-permute" not in hlo_bytes[True], hlo_bytes
    assert hlo_bytes[True]["all-reduce"] < 0.7 * hlo_bytes[False][
        "all-reduce"
    ], hlo_bytes


def test_sharded_step_matches_unsharded(tiny_dit):
    """The dp2/fsdp2/tp2 sharded step must compute the same math as the
    single-device step on the same params, batch and seeds — the TPU
    counterpart of DDP's exact-replica guarantee (reference train.py:220).

    Two layers of proof:
    * SGD step: updated params are (p - lr * grad), so param equality IS
      gradient equality — asserted tightly (collective reordering moves
      fp32 sums by ~1e-7 relative only).
    * Production Adam+EMA step: loss must match tightly. Params are
      checked with a sign-flip-tolerant criterion: at step 1 Adam's
      update is ~lr * sign(g), so elements whose true gradient is
      ~float-eps can legitimately flip under reduction reordering; a
      *bug* (wrong mean across the data axis, per-shard dropout rng,
      fsdp gather numerics) shifts a large fraction of elements instead.
    """
    import optax

    model = _tiny_model()
    batch_size = 8
    lr = 1e-3
    step_rng = jax.random.PRNGKey(1)
    batch = _batch(batch_size)
    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})

    def run_pair(opt):
        state1 = create_train_state(model, jax.random.PRNGKey(0), opt,
                                    batch_size=2)
        step1 = jax.jit(make_train_step(model, opt, **STEP_KW))
        new1, m1 = step1(state1, batch, step_rng)
        with mesh:
            shapes = jax.eval_shape(lambda s: s, state1)
            from maskdit_tpu.parallel.sharded import state_shardings

            shardings = state_shardings(shapes, mesh)
            # transplant the SAME param/opt values into the sharded layout
            state8 = jax.device_put(jax.device_get(state1), shardings)
            step8 = make_sharded_train_step(
                model, opt, mesh, shardings, donate=False, **STEP_KW
            )
            new8, m8 = step8(state8, batch, step_rng)
        return new1, m1, new8, m8

    # --- SGD: param diff == lr * grad diff -> tight gradient equality
    new1, m1, new8, m8 = run_pair(optax.sgd(lr))
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-6
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=lr * 2e-5, rtol=0
        )

    # --- production Adam + EMA
    opt = make_optimizer(lr, global_batch_size=batch_size)
    new1, m1, new8, m8 = run_pair(opt)
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-6
    total = flipped = 0
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
        d = jnp.abs(a - b)
        assert float(jnp.max(d)) <= 2.05 * lr  # bounded by a full sign flip
        total += d.size
        flipped += int(jnp.sum(d > 1e-5))
    assert flipped / total < 5e-3, f"{flipped}/{total} elements moved"
    for a, b in zip(
        jax.tree.leaves(new1.ema_params), jax.tree.leaves(new8.ema_params)
    ):
        # EMA mixes 1e-4 of the params delta -> flips shrink by 1e-4
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.05 * lr * 1e-4 + 1e-7, rtol=0
        )


def test_sharded_step_with_sr_nu_matches_unsharded(tiny_dit):
    """train.nu_dtype='bfloat16' (stochastically rounded narrow second
    moment, ops/fused_adam.py:adam_sr_nu) on the dp2/fsdp2/tp2 sharded
    step: same loss and params as the single-device step, nu stays bf16
    and agrees within one bf16 ulp (the SR key is derived from the step
    count, so both runs draw identical rounding bits; only collective
    reduction reordering of the pre-rounded value can flip a decision)."""
    model = _tiny_model()
    batch_size = 8
    lr = 1e-3
    opt = make_optimizer(
        lr, global_batch_size=batch_size, fused=False, nu_dtype="bfloat16"
    )
    batch = _batch(batch_size)
    step_rng = jax.random.PRNGKey(1)
    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})

    state1 = create_train_state(model, jax.random.PRNGKey(0), opt,
                                batch_size=2)
    step1 = jax.jit(make_train_step(model, opt, **STEP_KW))
    new1, m1 = step1(state1, batch, step_rng)
    with mesh:
        from maskdit_tpu.parallel.sharded import state_shardings

        shapes = jax.eval_shape(lambda s: s, state1)
        shardings = state_shardings(shapes, mesh)
        state8 = jax.device_put(jax.device_get(state1), shardings)
        step8 = make_sharded_train_step(
            model, opt, mesh, shardings, donate=False, **STEP_KW
        )
        new8, m8 = step8(state8, batch, step_rng)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-6
    total = flipped = 0
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
        d = jnp.abs(a - b)
        assert float(jnp.max(d)) <= 2.05 * lr
        total += d.size
        flipped += int(jnp.sum(d > 1e-5))
    assert flipped / total < 5e-3, f"{flipped}/{total} elements moved"
    for a, b in zip(
        jax.tree.leaves(new1.opt_state[0].nu),
        jax.tree.leaves(new8.opt_state[0].nu),
    ):
        assert a.dtype == b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2 ** -7, atol=1e-12,
        )


def test_fused_adam_matches_staged_on_sharded_mesh(tiny_dit):
    """The fused single-sweep Adam+EMA (jnp mode) un-gated on sharded
    meshes (VERDICT r3 next #4): on a {data:2, fsdp:2, tensor:2} mesh it
    must produce the same params/EMA/moments as the staged optax chain —
    both are fp32 math, so agreement is tight — and the optimizer-only
    program must contain NO all-gathers (the update is elementwise over
    identically-sharded leaves; a gather would mean GSPMD fell back to
    replicating a param-sized buffer). Reference counterpart being
    replaced at scale: apex FusedAdam (reference train.py:141)."""
    from maskdit_tpu.parallel.sharded import state_shardings
    from maskdit_tpu.train.state import _apply_updates_fused

    model = _tiny_model()
    batch_size = 8
    lr = 1e-3
    batch = _batch(batch_size)
    step_rng = jax.random.PRNGKey(1)
    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})

    opt_staged = make_optimizer(lr, global_batch_size=batch_size, fused=False)
    opt_fused = make_optimizer(lr, global_batch_size=batch_size, fused="jnp")

    results = {}
    for name, opt in (("staged", opt_staged), ("fused", opt_fused)):
        with mesh:
            state, shardings = create_sharded_state(
                model, jax.random.PRNGKey(0), opt, mesh, batch_size=2
            )
            step = make_sharded_train_step(
                model, opt, mesh, shardings, donate=False, **STEP_KW
            )
            new, m = step(state, batch, step_rng)
            results[name] = (jax.device_get(new), float(m["loss"]))

    (st_s, loss_s), (st_f, loss_f) = results["staged"], results["fused"]
    assert abs(loss_s - loss_f) < 1e-6
    for tree_s, tree_f in (
        (st_s.params, st_f.params),
        (st_s.ema_params, st_f.ema_params),
        (st_s.opt_state[0].mu, st_f.opt_state[0].mu),
        (st_s.opt_state[0].nu, st_f.opt_state[0].nu),
    ):
        for a, b in zip(jax.tree.leaves(tree_s), jax.tree.leaves(tree_f)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-7, rtol=1e-5
            )

    # optimizer-only program: no all-gather may appear (elementwise update
    # over leaves that share one sharding cannot need one)
    with mesh:
        state, shardings = create_sharded_state(
            model, jax.random.PRNGKey(0), opt_fused, mesh, batch_size=2
        )
        grads = jax.device_get(state.params)  # any param-shaped tree

        def opt_only(params, grads, opt_state, ema):
            return _apply_updates_fused(
                opt_fused, params, grads, opt_state, ema, 0.9999,
                jnp.zeros((), jnp.int32),
            )

        lowered = jax.jit(
            opt_only,
            in_shardings=(
                shardings.params, shardings.params,
                shardings.opt_state, shardings.ema_params,
            ),
            out_shardings=(
                shardings.params, shardings.opt_state, shardings.ema_params
            ),
        ).lower(state.params, grads, state.opt_state, state.ema_params)
        hlo = lowered.compile().as_text()
    assert "all-gather" not in hlo, "fused optimizer introduced gathers"


def test_fused_sr_nu_on_sharded_mesh_matches_unsharded(tiny_dit):
    """FusedAdamEma with nu_dtype='bfloat16' (the full narrow-state
    config) on the sharded mesh: loss and params track the unsharded
    fused run; nu stays bf16. The SR key derives from the Adam step
    count, so both runs draw identical rounding bits."""
    model = _tiny_model()
    batch_size = 8
    lr = 1e-3
    opt = make_optimizer(
        lr, global_batch_size=batch_size, fused="jnp",
        moment_dtype="bfloat16", nu_dtype="bfloat16",
    )
    batch = _batch(batch_size)
    step_rng = jax.random.PRNGKey(1)

    state1 = create_train_state(model, jax.random.PRNGKey(0), opt,
                                batch_size=2)
    step1 = jax.jit(make_train_step(model, opt, **STEP_KW))
    new1, m1 = step1(state1, batch, step_rng)

    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    with mesh:
        from maskdit_tpu.parallel.sharded import state_shardings

        shapes = jax.eval_shape(lambda s: s, state1)
        shardings = state_shardings(shapes, mesh)
        state8 = jax.device_put(jax.device_get(state1), shardings)
        step8 = make_sharded_train_step(
            model, opt, mesh, shardings, donate=False, **STEP_KW
        )
        new8, m8 = step8(state8, batch, step_rng)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-6
    total = flipped = 0
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
        d = jnp.abs(a - b)
        assert float(jnp.max(d)) <= 2.05 * lr
        total += d.size
        flipped += int(jnp.sum(d > 1e-5))
    assert flipped / total < 5e-3, f"{flipped}/{total} elements moved"
    for a, b in zip(
        jax.tree.leaves(new1.opt_state[0].nu),
        jax.tree.leaves(new8.opt_state[0].nu),
    ):
        assert a.dtype == b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2 ** -7, atol=1e-12,
        )


def test_cross_topology_checkpoint_restore(tmp_path, tiny_dit):
    """Save from a 2x2x2-sharded run, restore onto a data-only 8-way
    layout, and continue training — the elastic-resume scenario."""
    from maskdit_tpu.utils.ckpt import CheckpointManager

    model = _tiny_model()
    batch_size = 8
    opt = make_optimizer(1e-3, global_batch_size=batch_size)
    batch = _batch(batch_size)

    mesh_a = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    with mesh_a:
        state, shardings = create_sharded_state(
            model, jax.random.PRNGKey(0), opt, mesh_a, batch_size=2
        )
        step_a = make_sharded_train_step(
            model, opt, mesh_a, shardings, donate=False, **STEP_KW
        )
        state, _ = step_a(state, batch, jax.random.PRNGKey(1))
        params_after_1 = jax.device_get(state.params)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(jax.device_get(state.step)), state)
        mgr.wait()

    # new topology: pure data-parallel 8-way
    mesh_b = create_mesh({"data": 8, "fsdp": 1, "tensor": 1})
    with mesh_b:
        abstract, shardings_b = create_sharded_state(
            model, jax.random.PRNGKey(99), opt, mesh_b, batch_size=2
        )
        mgr_b = CheckpointManager(str(tmp_path / "ckpt"))
        restored = mgr_b.restore(jax.tree.map(lambda x: x, abstract))
        assert int(jax.device_get(restored.step)) == 1

        # restored values equal the saved ones, now in the new layout
        for a, b in zip(
            jax.tree.leaves(params_after_1), jax.tree.leaves(restored.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        step_b = make_sharded_train_step(
            model, opt, mesh_b, shardings_b, donate=False, **STEP_KW
        )
        restored, metrics = step_b(restored, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert int(jax.device_get(restored.step)) == 2
        mgr.close()
        mgr_b.close()


def test_restored_run_matches_uninterrupted_run(tmp_path, tiny_dit):
    """Save/restore must be transparent to the training trajectory:
    2 continuous sharded steps == 1 step + save + cross-topology restore
    + 1 step, bitwise up to collective reordering."""
    from maskdit_tpu.utils.ckpt import CheckpointManager

    model = _tiny_model()
    batch_size = 8
    opt = make_optimizer(1e-3, global_batch_size=batch_size)
    batch = _batch(batch_size)
    r1, r2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    # uninterrupted: 2 steps on one topology
    mesh_a = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    with mesh_a:
        state, shardings = create_sharded_state(
            model, jax.random.PRNGKey(0), opt, mesh_a, batch_size=2
        )
        step_a = make_sharded_train_step(
            model, opt, mesh_a, shardings, donate=False, **STEP_KW
        )
        state, _ = step_a(state, batch, r1)
        mgr = CheckpointManager(str(tmp_path / "ckpt2"))
        mgr.save(1, state)
        mgr.wait()
        state, _ = step_a(state, batch, r2)
        cont_params = jax.device_get(state.params)

    mesh_b = create_mesh({"data": 8, "fsdp": 1, "tensor": 1})
    with mesh_b:
        abstract, shardings_b = create_sharded_state(
            model, jax.random.PRNGKey(99), opt, mesh_b, batch_size=2
        )
        restored = CheckpointManager(str(tmp_path / "ckpt2")).restore(
            jax.tree.map(lambda x: x, abstract)
        )
        step_b = make_sharded_train_step(
            model, opt, mesh_b, shardings_b, donate=False, **STEP_KW
        )
        restored, _ = step_b(restored, batch, r2)

    worst = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree.leaves(cont_params), jax.tree.leaves(restored.params)
        )
    )
    assert worst < 5e-6, f"resume-vs-continuous drift {worst}"
