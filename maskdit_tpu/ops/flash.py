"""Fused multi-head attention Pallas kernels for short packed sequences.

MaskDiT attention runs on at most 1024 tokens (512 packed at mask 0.5 —
SURVEY.md §5), so an entire (batch, head) attention slice fits in VMEM.
Instead of a streaming flash kernel, each grid step computes one (b, h)
slice start-to-finish: the (L, L) logits/probs matrices never touch HBM,
which is the entire memory win at these shapes.

Layout: heads are padded to a 128 lane dim by the wrapper (head_dim 72 for
DiT-XL, 64 for B/S, 32 for the 512-wide decoder); the pad lanes are zero
and fall out of both the dot products and the sliced output. Softmax is
fp32 regardless of input dtype. Custom VJP recomputes probs from the saved
logsumexp, so residuals are just (q, k, v, o, lse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskdit_tpu.ops.interpret import interpret_mode

LANE = 128


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (L, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (L, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l)).reshape(1, -1)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0].reshape(-1, 1)  # (L, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # (L, L) softmax probs

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (L, 1)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _block_specs(l: int, d: int, n: int):
    data = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return data, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    o, _ = _flash_fwd(q, k, v, scale)
    return o


def _flash_fwd(q, k, v, scale):
    n, l, d = q.shape
    data, lse_spec = _block_specs(l, d, n)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(n,),
        in_specs=[data, data, data],
        out_specs=[data, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, l, d), q.dtype),
            jax.ShapeDtypeStruct((n, 1, l), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(q, k, v)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    n, l, d = q.shape
    data, lse_spec = _block_specs(l, d, n)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(n,),
        in_specs=[data, data, data, data, lse_spec, data],
        out_specs=[data, data, data],
        out_shape=[
            jax.ShapeDtypeStruct((n, l, d), q.dtype),
            jax.ShapeDtypeStruct((n, l, d), k.dtype),
            jax.ShapeDtypeStruct((n, l, d), v.dtype),
        ],
        interpret=interpret_mode(),
    )(q, k, v, o, lse, g)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def supports(l: int) -> bool:
    """Kernel constraint: full-L blocks need lane-aligned L."""
    return l % LANE == 0 and l <= 2048


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(N, H, L, hd) fused attention; falls back if L is not lane-aligned.

    The head dim is passed through unpadded — Mosaic pads the lane dim
    inside VMEM, which costs nothing in HBM (a host-side jnp.pad to 128
    lanes would 4x the decoder's attention traffic at hd=32).
    """
    n, h, l, hd = q.shape
    if not supports(l):
        from maskdit_tpu.ops.attention import mha_reference

        return mha_reference(q, k, v)
    scale = hd ** -0.5

    def prep(x):
        return x.reshape(n * h, l, hd)

    out = _flash(prep(q), prep(k), prep(v), scale)
    return out.reshape(n, h, l, hd)
