"""Loss-curve equivalence check for narrow Adam-state storage.

Trains the same small MaskDiT twice from identical seeds — once with
fp32 Adam state, once with the narrow variant — on a fixed synthetic
stream, and reports the per-step loss gap. Step-level rounding bounds
live in tests/test_fused_adam.py; this is the dynamics-level
complement: over N steps the two runs' loss curves must track within
optimizer-noise scale (no drift / divergence).

Variants:
  mu    — moment_dtype='bfloat16' (first moment, round-to-nearest)
  nu    — nu_dtype='bfloat16' (second moment, stochastic rounding)
  munu  — both narrow (the full 2.7 GB-of-state saving for XL/2)

Usage:  python tools/mu_dtype_curve.py [steps=200] [out.json] [variant=mu]

Measured (DiT-S, TPU v5e, 200 steps, identical seeds/stream):
  mu   : max per-step |gap| = 1.14e-4, tail-20-mean gap 1.4e-5
         (loss scale ~0.73) — statistically indistinguishable.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)

VARIANTS = {
    "mu": {"moment_dtype": "bfloat16"},
    "nu": {"nu_dtype": "bfloat16"},
    "munu": {"moment_dtype": "bfloat16", "nu_dtype": "bfloat16"},
}


def run(steps: int, *, moment_dtype=None, nu_dtype=None):
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=16, img_channels=4, num_classes=16,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.bfloat16,
    )
    opt = make_optimizer(
        1e-4, global_batch_size=32, fused="jnp",
        moment_dtype=moment_dtype, nu_dtype=nu_dtype,
    )
    state = jax.jit(
        lambda r: create_train_state(model, r, opt, batch_size=1)
    )(jax.random.PRNGKey(0))
    step = jax.jit(
        make_train_step(
            model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
            class_dropout_prob=0.1, log_grad_norm=False,
        ),
        donate_argnums=(0,),
    )
    losses = []
    for i in range(steps):
        rng = jax.random.PRNGKey(100 + i)
        batch = {
            "x": jax.random.normal(
                jax.random.fold_in(rng, 0), (32, 8, 16, 16)
            ),
            "y": jax.nn.one_hot(
                jax.random.randint(jax.random.fold_in(rng, 1), (32,), 0, 16),
                16,
            ),
        }
        state, metrics = step(state, batch, rng)
        losses.append(metrics["loss"])
    return [float(x) for x in jax.device_get(losses)]


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = sys.argv[2] if len(sys.argv) > 2 else None
    variant = sys.argv[3] if len(sys.argv) > 3 else "mu"
    narrow_kwargs = VARIANTS[variant]
    l32 = run(steps)
    l16 = run(steps, **narrow_kwargs)
    gaps = [abs(a - b) for a, b in zip(l32, l16)]
    tail32 = sum(l32[-20:]) / 20
    tail16 = sum(l16[-20:]) / 20
    report = {
        "variant": variant,
        "steps": steps,
        "final_loss_fp32": l32[-1],
        f"final_loss_{variant}": l16[-1],
        "tail20_mean_fp32": tail32,
        f"tail20_mean_{variant}": tail16,
        "tail20_gap": abs(tail32 - tail16),
        "max_step_gap": max(gaps),
        "mean_step_gap": sum(gaps) / len(gaps),
    }
    print(json.dumps(report, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump({"report": report, "fp32": l32, variant: l16}, f)


if __name__ == "__main__":
    main()
