"""Microbenchmark attention implementations at the MaskDiT training shapes.

Usage: python tools/attn_bench.py [impl ...]
impls: xla | flash | batched (default: all)

Times fwd and fwd+bwd at the XL/2@256 encoder (48,16,128,72) and decoder
(48,16,256,32) shapes, bf16, on the real chip.
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

SHAPES = [
    ("enc", (48, 16, 128, 72)),
    ("dec", (48, 16, 256, 32)),
    ("enc512", (48, 16, 512, 72)),
]


def impl_fn(name):
    if name == "xla":
        from maskdit_tpu.ops.attention import mha_reference

        return mha_reference
    if name == "flash":
        from maskdit_tpu.ops.flash import flash_mha

        return flash_mha
    if name == "batched":
        from maskdit_tpu.ops.flash_batched import flash_mha_batched

        return flash_mha_batched
    raise SystemExit(f"unknown impl {name}")


def timeit(f, args, iters=30):
    out = f(*args)
    float(jax.device_get(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jax.device_get(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters


def main():
    impls = sys.argv[1:] or ["xla", "batched", "flash"]
    rng = jax.random.PRNGKey(0)
    for sname, shape in SHAPES:
        qkv = [
            jax.jit(
                lambda k: jax.random.normal(k, shape, jnp.bfloat16)
            )(jax.random.fold_in(rng, i))
            for i in range(3)
        ]
        for name in impls:
            fn = impl_fn(name)
            fwd = jax.jit(fn)
            t_f = timeit(fwd, qkv)

            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32))

            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_b = timeit(grad, qkv)
            print(
                f"{sname} {shape} {name:8s}: fwd {t_f*1e3:7.3f} ms, "
                f"fwd+bwd {t_b*1e3:7.3f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
