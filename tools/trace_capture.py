"""Capture a jax.profiler trace of the XL/2 train step on the TPU.

Usage:
  python tools/trace_capture.py /tmp/trace_512_bs16          # plain step
  PROBE_RES=64 PROBE_BATCH=16 python tools/trace_capture.py OUT
  PROBE_RES=64 PROBE_BATCH=56 PROBE_GA=8 PROBE_ACC=bfloat16 PROBE_AMP=1 \
      python tools/trace_capture.py OUT

Env knobs mirror tools/perf_probe.py (PROBE_RES latent res, PROBE_BATCH,
PROBE_GA, PROBE_AMP, PROBE_ACC, PROBE_FLASH, PROBE_REMAT). Warms up, then
traces N_STEPS (default 3) steps. Parse with tools/trace_report.py.
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


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    n_steps = int(os.environ.get("N_STEPS", "3"))

    from tools.perf_probe import build
    from maskdit_tpu.train.state import make_train_step

    model, opt, state, batch, rng = build()
    ga = int(os.environ.get("PROBE_GA", "1"))
    amp = os.environ.get("PROBE_AMP", "0") == "1"
    acc = os.environ.get("PROBE_ACC") or None
    step = jax.jit(
        make_train_step(
            model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
            class_dropout_prob=0.1, log_grad_norm=False,
            grad_accum=ga, amp_grads=amp, accum_dtype=acc,
        ),
        donate_argnums=(0,),
    )
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    float(jax.device_get(m["loss"]))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(2):
        state, m = step(state, batch, rng)
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = step(state, batch, rng)
    float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / 5
    print(f"steady state: {dt * 1e3:.1f} ms/step", flush=True)

    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            state, m = step(state, batch, rng)
        float(jax.device_get(m["loss"]))
    print(f"trace written to {out_dir}", flush=True)


if __name__ == "__main__":
    main()
