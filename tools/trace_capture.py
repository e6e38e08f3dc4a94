"""Capture a jax.profiler trace of the XL/2 train step on the TPU.

Usage:
  python tools/trace_capture.py /tmp/trace_512_bs16          # plain step
  PROBE_RES=64 PROBE_BATCH=16 python tools/trace_capture.py OUT
  PROBE_RES=64 PROBE_BATCH=56 PROBE_GA=8 PROBE_ACC=bfloat16 PROBE_AMP=1 \
      python tools/trace_capture.py OUT

Env knobs mirror tools/perf_probe.py (PROBE_RES latent res, PROBE_BATCH,
PROBE_GA, PROBE_AMP, PROBE_ACC, PROBE_FLASH, PROBE_REMAT); PROBE_MODE=sample
traces the CFG EDM sampler instead (PROBE_STEPS, PROBE_BATCH). Warms up, then
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


def _sample_main(out_dir: str, n_steps: int) -> None:
    """PROBE_MODE=sample: trace the inference path (CFG EDM sampler).

    Knobs: PROBE_RES latent res (32/64), PROBE_BATCH (default 128/32),
    PROBE_STEPS sampler steps (default 40)."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.sampling.generate import SamplerConfig, make_sample_fn

    res = int(os.environ.get("PROBE_RES", "32"))
    batch = int(os.environ.get("PROBE_BATCH", "128" if res == 32 else "32"))
    num_steps = int(os.environ.get("PROBE_STEPS", "40"))
    model = create_model(
        "edm", img_resolution=res, img_channels=4, num_classes=1000,
        model_type="DiT-XL/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(
        lambda r: model.init(
            {"params": r}, jnp.zeros((1, 4, res, res)), jnp.ones((1,)),
            jnp.zeros((1, 1000)),
        )
    )(jax.random.PRNGKey(0))
    fn = make_sample_fn(
        model, variables["params"],
        SamplerConfig(num_steps=num_steps, cfg_scale=1.5),
    )
    latents = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, res, res))
    labels = jax.nn.one_hot(jnp.arange(batch) % 1000, 1000)
    rng = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    z = fn(latents, labels, rng)
    float(jnp.sum(z.astype(jnp.float32)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    z = fn(latents, labels, rng)
    float(jnp.sum(z.astype(jnp.float32)))
    print(f"steady: {(time.perf_counter()-t0)*1e3:.0f} ms/batch "
          f"({batch/(time.perf_counter()-t0):.2f} imgs/s)", flush=True)
    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            z = fn(latents, labels, rng)
        float(jnp.sum(z.astype(jnp.float32)))
    print(f"trace written to {out_dir}", flush=True)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    n_steps = int(os.environ.get("N_STEPS", "3"))
    if os.environ.get("PROBE_MODE") == "sample":
        return _sample_main(out_dir, max(1, n_steps // 3))

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
