"""Ahead-of-time export of compiled samplers (serving path).

The sampling graph (79 CFG-doubled net evals as one lax.scan) takes minutes
to compile on a cold process. For production serving we serialize the
lowered StableHLO once with ``jax.export`` and reload it in O(seconds) —
no Python model code, no retracing, runnable from any process with a
compatible jax runtime. (No reference counterpart: the reference re-runs
torch.compile per process.)

  blob = export_sampler(model, params, cfg, batch_size)
  sample = load_sampler(blob)
  latents_out = sample(params, latents, labels, rng)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from maskdit_tpu.models.precond import EDMPrecond
from maskdit_tpu.sampling.generate import SamplerConfig, make_sample_fn


def _abstract_args(model: EDMPrecond, params: Any, batch_size: int):
    res, ch = model.img_resolution, model.img_channels
    latents = jax.ShapeDtypeStruct((batch_size, ch, res, res), jnp.float32)
    labels = jax.ShapeDtypeStruct(
        (batch_size, model.num_classes or 0), jnp.float32
    )
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    params_shapes = jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params
    )
    return params_shapes, latents, labels, rng


def export_sampler(
    model: EDMPrecond,
    params: Any,
    cfg: SamplerConfig,
    batch_size: int,
) -> bytes:
    """Serialize the jitted sampler for (model config, cfg, batch_size)."""
    # rebuild the underlying param-explicit jitted fn (make_sample_fn binds
    # params; for export we need them as an argument)
    kwargs: dict = {"num_steps": cfg.num_steps, "S_churn": cfg.S_churn}
    kwargs.update(cfg.extra)
    from maskdit_tpu.sampling.edm import ablation_sampler, edm_sampler

    if cfg.use_ablation:
        kwargs.update(
            solver=cfg.solver or "heun",
            discretization=cfg.discretization or "edm",
            schedule=cfg.schedule or "linear",
            scaling=cfg.scaling or "none",
        )
        sampler = ablation_sampler
    else:
        sampler = edm_sampler

    def fn(p, latents, labels, rng_bits):
        rng = jax.random.wrap_key_data(rng_bits, impl="threefry2x32")

        def denoise(x, sigma):
            return model.apply(
                {"params": p}, x,
                jnp.full((x.shape[0],), sigma, jnp.float32), labels,
                cfg_scale=cfg.cfg_scale,
            )["x"]

        churn_rng = rng if cfg.S_churn > 0 else None
        return sampler(denoise, latents, rng=churn_rng, **kwargs)

    exported = jax_export.export(jax.jit(fn))(
        *_abstract_args(model, params, batch_size)
    )
    return bytes(exported.serialize())


def load_sampler(blob: bytes):
    """Deserialize an exported sampler into a callable.

    The callable takes (params, latents, labels, rng_key_data) where
    rng_key_data is ``jax.random.key_data(key)`` (uint32[2]).
    """
    exported = jax_export.deserialize(blob)

    def call(params, latents, labels, rng):
        rng_bits = (
            jax.random.key_data(rng)
            if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng
        )
        return exported.call(params, latents, labels, np.asarray(rng_bits))

    return call
