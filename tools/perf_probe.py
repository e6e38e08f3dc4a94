"""Localize where the XL/2 train-step time goes on one TPU chip.

Times isolated pieces of the flagship workload (bench.py config: XL/2,
256-res latents, mask 0.5, bs48) so perf work attacks the real bottleneck
instead of a guess. Each variant is one jit program; the persistent
compilation cache makes re-runs cheap.

Usage: python tools/perf_probe.py fwd grad step opt grad_noattn ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)

BATCH = int(os.environ.get("PROBE_BATCH", "48"))


def log(msg):
    print(msg, flush=True)


def timeit(name, fn, *args, iters=10, warmup=2):
    """Dispatch-pipelined timing with an honest device_get sync."""
    t0 = time.perf_counter()
    out = fn(*args)
    scalar = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(scalar.astype(jnp.float32))))
    log(f"  [{name}] compile+first: {time.perf_counter()-t0:.1f}s")
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / iters
    log(f"  [{name}] {dt*1e3:.1f} ms")
    return dt


def build(scan_blocks=False, flash=None):
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import create_train_state, make_optimizer

    remat = os.environ.get("PROBE_REMAT", "none")
    if os.environ.get("PROBE_FLASH") == "0":
        flash = False
    res = int(os.environ.get("PROBE_RES", "32"))  # latent res: 32=256px, 64=512px
    model = create_model(
        "edm", img_resolution=res, img_channels=4, num_classes=1000,
        model_type="DiT-XL/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.bfloat16, scan_blocks=scan_blocks, use_flash=flash,
        remat=False if remat in ("none", "0") else remat,
    )
    # PROBE_MU=bfloat16 stores the Adam first moment narrower (matches
    # bench.py's accum-config default; see make_optimizer docstring)
    opt = make_optimizer(
        1e-4, global_batch_size=BATCH, fused="jnp",
        moment_dtype=os.environ.get("PROBE_MU") or None,
    )
    state = jax.jit(
        lambda r: create_train_state(model, r, opt, batch_size=1)
    )(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    batch = {
        "x": jax.random.normal(jax.random.fold_in(rng, 0), (BATCH, 8, res, res)),
        "y": jax.nn.one_hot(
            jax.random.randint(jax.random.fold_in(rng, 1), (BATCH,), 0, 1000),
            1000,
        ),
    }
    return model, opt, state, batch, rng


def make_grad_fn(model, params_template):
    """value_and_grad of the microbatch loss only (no optimizer/EMA)."""
    from maskdit_tpu.train.loss import EDMLoss
    from maskdit_tpu.train.state import reparameterize_moments

    loss_fn = EDMLoss()

    def loss(params, x, y, rng):
        x = reparameterize_moments(jax.random.fold_in(rng, 7), x)

        def net_apply(xin, sigma, labels, m_ratio, f, rngs, mask_info=None):
            return model.apply(
                {"params": params}, xin, sigma, labels, mask_ratio=m_ratio,
                mask_info=mask_info, feat=f, train=True, rngs=rngs,
            )

        vec, aux = loss_fn(
            net_apply, x, rng, labels=y, mask_ratio=0.5,
            mae_loss_coef=0.1, patch_size=2,
        )
        return vec.mean(), aux

    return loss


def main():
    modes = sys.argv[1:] or ["fwd", "grad", "step", "opt"]
    import maskdit_tpu.models.layers as L

    results = {}
    for mode in modes:
        log(f"== {mode} (batch {BATCH}) ==")
        # ablation monkeypatches (timing-only; numerics intentionally wrong)
        saved = {}
        if mode == "step_noattn":
            saved["mha"] = L.mha
            L.mha = lambda q, k, v, use_flash=None, kv_valid=None: v
        elif mode == "step_nogelu":
            saved["gelu_tanh"] = L.gelu_tanh
            L.gelu_tanh = lambda x: x
        elif mode == "step_noln":
            saved["layer_norm_no_affine"] = L.layer_norm_no_affine
            L.layer_norm_no_affine = lambda x, eps=1e-6: x
        elif mode == "step_flashb":
            # route the flash dispatch to the batched-head kernel
            from maskdit_tpu.ops import flash, flash_batched

            saved["_flash_mha"] = flash.flash_mha
            flash.flash_mha = flash_batched.flash_mha_batched

        try:
            scan = mode == "step_scan"
            flash = True if mode in ("step_flash", "step_flashb") else None
            model, opt, state, batch, rng = build(scan_blocks=scan, flash=flash)

            if mode == "fwd":
                lf = make_grad_fn(model, state.params)
                f = jax.jit(lambda p, b, r: lf(p, b["x"], b["y"], r)[0])
                results[mode] = timeit(mode, f, state.params, batch, rng)
            elif mode == "opt":
                from maskdit_tpu.train.state import _apply_updates_fused

                grads = jax.jit(
                    lambda p: jax.tree.map(lambda a: a * 1e-6, p)
                )(state.params)

                def upd(params, grads, opt_state, ema):
                    return _apply_updates_fused(
                        opt, params, grads, opt_state, ema, 0.9999,
                        jnp.zeros((), jnp.int32),
                    )

                f = jax.jit(upd, donate_argnums=(0, 2, 3))
                p, o, e = state.params, state.opt_state, state.ema_params
                del state
                import time as _t

                t0 = _t.perf_counter()
                p, o, e = f(p, grads, o, e)
                float(jax.device_get(jnp.sum(jax.tree.leaves(p)[0])))
                log(f"  [opt] compile+first: {_t.perf_counter()-t0:.1f}s")
                t0 = _t.perf_counter()
                iters = 10
                for _ in range(iters):
                    p, o, e = f(p, grads, o, e)
                float(jax.device_get(jnp.sum(jax.tree.leaves(p)[0])))
                dt = (_t.perf_counter() - t0) / iters
                log(f"  [opt] {dt*1e3:.1f} ms")
                results[mode] = dt
                continue
            elif mode.startswith("step"):
                from maskdit_tpu.train.state import make_train_step

                ga = int(os.environ.get("PROBE_GA", "1"))
                amp = os.environ.get("PROBE_AMP", "0") == "1"
                acc = os.environ.get("PROBE_ACC") or None
                # PROBE_PAD=1: pad-to-max masking (one compiled step for
                # every mask ratio; ratio rides the batch as a scalar)
                pad = os.environ.get("PROBE_PAD", "0") == "1"
                step = jax.jit(
                    make_train_step(
                        model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
                        class_dropout_prob=0.1, log_grad_norm=False,
                        grad_accum=ga, amp_grads=amp, accum_dtype=acc,
                        pad_to_max=pad,
                        accum_unroll=int(os.environ.get("PROBE_UNROLL", "1")),
                        peel_last_micro=os.environ.get("PROBE_PEEL", "0") == "1",
                    ),
                    donate_argnums=(0,),
                )
                if pad:
                    batch = dict(batch)
                    batch["mask_ratio"] = jnp.asarray(
                        float(os.environ.get("PROBE_RATIO", "0.5"))
                    )
                st = state
                t0 = time.perf_counter()
                st, m = step(st, batch, rng)
                float(jax.device_get(m["loss"]))
                log(f"  [step] compile+first: {time.perf_counter()-t0:.1f}s")
                for _ in range(2):
                    st, m = step(st, batch, rng)
                float(jax.device_get(m["loss"]))
                t0 = time.perf_counter()
                iters = 10
                for _ in range(iters):
                    st, m = step(st, batch, rng)
                float(jax.device_get(m["loss"]))
                dt = (time.perf_counter() - t0) / iters
                log(f"  [step] {dt*1e3:.1f} ms")
                results[mode] = dt
        finally:
            for k, v in saved.items():
                if k == "_flash_mha":
                    from maskdit_tpu.ops import flash

                    flash.flash_mha = v
                else:
                    setattr(L, k, v)

    log("== summary ==")
    for k, v in results.items():
        log(f"{k}: {v*1e3:.1f} ms")


if __name__ == "__main__":
    main()
