"""Packed-layout fused attention Pallas kernel for short sequences.

MaskDiT training attention is SHORT: packed encoder L=128 (256-res,
mask 0.5), decoder L=256. At these shapes XLA's attention region costs
~40 ms of the 196 ms XL/2 bs48 train step (measured by ablation), and a
profile splits that cost into two equal halves: the qkv head
split/transpose/merge copies (~18 ms of `data formatting`) and the
softmax math itself. A kernel that takes (N, H, L, hd) operands keeps
paying the first half — so this one consumes the qkv Dense output
(N, L, 3D) DIRECTLY and emits (N, L, D):

  grid = (N,); per step the whole (L, 3D) slice sits in VMEM and each
  head is a static 72- or 32-lane slice of it (Mosaic relayouts inside
  VMEM, no HBM copies); the (L, L) logits/probs never leave VMEM.

Backward recomputes EVERYTHING from (qkv, dout): softmax, probs, and the
output o needed for the delta term. The custom VJP therefore keeps only
the packed qkv as residual — the same buffer the model's named 'qkv_out'
checkpoint already saves, so attention adds ZERO bwd memory (the fp32
probs residuals XLA saves are ~2.9 GB/step at bs48).

Reference parity: math identical to timm Attention (reference
models/maskdit.py:178) — fp32 softmax, bf16 matmuls (MXU accumulates
fp32 via preferred_element_type).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskdit_tpu.ops.interpret import interpret_mode

LANE = 128
# VMEM working-set budget: double-buffered qkv/do/dqkv blocks must fit
# beside per-head fp32 logits scratch on a ~16 MB v5e core.
_VMEM_BUDGET = 12 * 1024 * 1024


def _pad_heads() -> bool:
    """Opt-in experiment (VERDICT r4 next #4): zero-pad each head's
    (hd, L) q/k slices to the full 128 MXU sublane height before the
    score dot. hd=72 contractions use 72 of the MXU's 128 rows; the
    hypothesis was that an aligned 128-row operand issues without
    masking/relayout overhead. The v/o dots contract L (already
    128-aligned) and are untouched. Read at trace time; toggle with
    MASKDIT_FLASH_PAD_HEADS=1. Measured on v5e — see STATUS.md round 5."""
    import os

    return os.environ.get("MASKDIT_FLASH_PAD_HEADS", "") == "1"


def _maybe_pad_s_dot(qT, kT, scale):
    """Score dot with optional sublane padding of the contraction dim."""
    hd, l = qT.shape
    if _pad_heads() and hd % LANE:
        pad = LANE - hd % LANE
        zer = jnp.zeros((pad, l), qT.dtype)
        qT = jnp.concatenate([qT, zer], axis=0)
        kT = jnp.concatenate([kT, zer], axis=0)
    return jax.lax.dot_general(
        qT, kT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale


def _fwd_kernel(qkv_ref, o_ref, ot_ref, *, scale: float, heads: int, d: int):
    """Transposed-basis attention: ONE tile transpose of the (L, 3D)
    block per grid step, after which every head is a sublane-aligned ROW
    slice (72h and 32h are multiples of 8). Measured at bs48 in the full
    XL/2 step: unaligned LANE slices at head boundaries cost 16 ms of
    Mosaic relayouts, XLA-side swapaxes around the kernel 4 ms — the
    in-kernel transpose variant is the fastest of the three (189.4 vs
    193.9 / 193.2 ms full step)."""
    hd = d // heads
    qkvT = qkv_ref[0].T  # (3D, L)
    for h in range(heads):
        qT = qkvT[h * hd:(h + 1) * hd, :]                  # (hd, L)
        kT = qkvT[d + h * hd:d + (h + 1) * hd, :]
        vT = qkvT[2 * d + h * hd:2 * d + (h + 1) * hd, :]
        # s_ij = sum_d q_id k_jd  ==  contract the sublane (d) dim
        s = _maybe_pad_s_dot(qT, kT, scale)  # (L, L)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pb = (p / l).astype(vT.dtype)
        # oT_dj = sum_j v_dj p_ij  -> (hd, L)
        oT = jax.lax.dot_general(
            vT, pb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ot_ref[h * hd:(h + 1) * hd, :] = oT.astype(ot_ref.dtype)
    o_ref[0] = ot_ref[:].T  # (L, D), tile transpose back


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, dt_ref,
                *, scale: float, heads: int, d: int):
    hd = d // heads
    qkvT = qkv_ref[0].T   # (3D, L)
    doT = do_ref[0].T     # (D, L)
    for h in range(heads):
        qT = qkvT[h * hd:(h + 1) * hd, :]
        kT = qkvT[d + h * hd:d + (h + 1) * hd, :]
        vT = qkvT[2 * d + h * hd:2 * d + (h + 1) * hd, :]
        doTh = doT[h * hd:(h + 1) * hd, :]

        s = _maybe_pad_s_dot(qT, kT, scale)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / l  # (L, L) fp32 probs, recomputed
        pb = p.astype(vT.dtype)

        # delta_i = sum_d do_di o_di with oT = v p^T recomputed
        oT = jax.lax.dot_general(
            vT, pb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(
            doTh.astype(jnp.float32) * oT, axis=0, keepdims=True
        )  # (1, L)

        # dvT = do^T p  -> (hd, L): contract the i dim
        dvT = jax.lax.dot_general(
            doTh, pb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dp_ij = sum_d do_di v_dj
        dp = jax.lax.dot_general(
            doTh, vT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta.T) * scale).astype(qT.dtype)  # (L, L)
        # dqT_di = sum_j k_dj ds_ij ; dkT_dj = sum_i q_di ds_ij
        dqT = jax.lax.dot_general(
            kT, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dkT = jax.lax.dot_general(
            qT, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dt_ref[h * hd:(h + 1) * hd, :] = dqT.astype(dt_ref.dtype)
        dt_ref[d + h * hd:d + (h + 1) * hd, :] = dkT.astype(dt_ref.dtype)
        dt_ref[2 * d + h * hd:2 * d + (h + 1) * hd, :] = dvT.astype(
            dt_ref.dtype
        )
    dqkv_ref[0] = dt_ref[:].T  # (L, 3D)


def _block(l: int, w: int):
    return pl.BlockSpec((1, l, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def packed_attention(qkv: jax.Array, num_heads: int, scale: float) -> jax.Array:
    """(N, L, 3D) packed qkv -> (N, L, D) attention output."""
    out, _ = _packed_fwd(qkv, num_heads, scale)
    return out


def _packed_fwd(qkv, num_heads, scale):
    n, l, three_d = qkv.shape
    d = three_d // 3
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=num_heads, d=d),
        grid=(n,),
        in_specs=[_block(l, three_d)],
        out_specs=_block(l, d),
        out_shape=jax.ShapeDtypeStruct((n, l, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((d, l), qkv.dtype)],
        interpret=interpret_mode(),
    )(qkv)
    return out, qkv


def _packed_bwd(num_heads, scale, qkv, g):
    n, l, three_d = qkv.shape
    d = three_d // 3
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=num_heads, d=d),
        grid=(n,),
        in_specs=[_block(l, three_d), _block(l, d)],
        out_specs=_block(l, three_d),
        out_shape=jax.ShapeDtypeStruct((n, l, three_d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((three_d, l), qkv.dtype)],
        interpret=interpret_mode(),
    )(qkv, g.astype(qkv.dtype))
    return (dqkv,)


packed_attention.defvjp(_packed_fwd, _packed_bwd)


def supports(h: int, l: int, d: int) -> bool:
    """Lane-aligned L; the backward working set must fit VMEM.

    The estimate is conservative (per advisor r2): besides the
    double-buffered bf16 data blocks (qkv + do + dqkv = 7D x L) it budgets
    the (3D, L) bf16 dt scratch and four live fp32 (L, L) temporaries
    (s/p, dp, ds, plus one for Mosaic's own liveness) — the bwd kernel
    materializes more than just s and p. XL/2: encoder (16, 128, 72) and
    decoder (16, 256, 32) fit; the 512-res shapes go to ops/flash_big.py
    (L=512 encoder's blocks alone need ~17 MB here)."""
    if l % LANE != 0:
        return False
    hidden = h * d
    blocks = 2 * 7 * hidden * l * 2  # double-buffered bf16 data blocks
    dt_scratch = 3 * hidden * l * 2  # (3D, L) bf16 transpose scratch
    temps = 4 * 4 * l * l            # ~4 live fp32 (L, L) temporaries
    return blocks + dt_scratch + temps <= _VMEM_BUDGET


def flash_mha_batched(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(N, H, L, hd) convenience wrapper: repacks into (N, L, 3D) and runs
    `packed_attention`. Prefer calling packed_attention from layer code —
    this wrapper's transposes are exactly the copies the kernel exists to
    avoid."""
    n, h, l, hd = q.shape
    scale = hd ** -0.5

    def pack(x):
        return x.transpose(0, 2, 1, 3).reshape(n, l, h * hd)

    qkv = jnp.concatenate([pack(q), pack(k), pack(v)], axis=-1)
    return (
        packed_attention(qkv, h, scale)
        .reshape(n, l, h, hd)
        .transpose(0, 2, 1, 3)
    )
