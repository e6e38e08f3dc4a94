"""Blocked packed-attention Pallas kernel for L >= 512 (the 512-res shapes).

`ops/flash_batched.py` (v2c) holds one whole (L, 3D) qkv slice per grid
step — at the 512-res training shapes (encoder L=512 packed @ D=1152,
decoder L=1024 @ D=512) that working set no longer fits VMEM next to the
fp32 (L, L) softmax temporaries, so round 2 fell back to the XLA path for
the encoder. The fallback is expensive at these sizes: XLA materializes
the fp32 logits/probs to HBM — (16, 16, 512, 512) fp32 = 268 MB per
encoder layer per direction, ~50+ GB/step of pure softmax traffic at bs16
(measured: the 512-res bs16 step moves 146.6 GB while ~40 GB is
fundamental; trace in STATUS.md round-3).

This kernel blocks two ways so everything stays in VMEM:

* **Head groups.** Grid is (N, G); each step processes H/G heads. To keep
  the per-group slices tile-aligned with hd=72, all kernel I/O lives in
  the TRANSPOSED basis (N, 3D, L): a head group is a contiguous ROW
  (sublane) slice — multiples of 8 — while in (N, L, 3D) layout a 72- or
  288-lane column slice is unaligned and pays Mosaic relayouts (the
  measured v2b lesson, flash_batched.py). The wrapper does one XLA
  transpose of qkv per layer (~0.1 ms at bs16/L=512, measured v2d cost)
  and the custom VJP stores the transposed buffer as its only residual.
* **Query chunks.** Inside a grid step, queries are processed in chunks
  of ``block_q`` against the FULL key range (K always fits VMEM here), so
  softmax rows complete in one pass — no online-softmax state. The fp32
  score/prob temporaries shrink from (L, L) to (block_q, L).

Backward recomputes softmax and the output from (qkvT, doT) — residual is
just qkvT, so attention adds zero backward memory beyond the named
'qkv_out' checkpoint the model already keeps. dK/dV accumulate over query
chunks in fp32 before one bf16 round at the end.

Reference parity: math identical to timm Attention (reference
models/maskdit.py:178) — fp32 softmax, bf16 matmuls with fp32 MXU
accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskdit_tpu.ops.interpret import interpret_mode

# VMEM plan budget: leave headroom under the ~16 MB/core for Mosaic's own
# temporaries and pipeline bookkeeping.
_VMEM_BUDGET = 10 * 1024 * 1024


def _plan(h: int, l: int, d: int):
    """Pick (head_groups, block_q) so the bwd working set fits VMEM.

    Returns None if no configuration fits. The backward estimate (the
    binding one): 7 double-buffered bf16 I/O blocks of (D/G, L) rows
    (q,k,v,do in; dq,dk,dv out), three fp32 (block_q, L) temporaries
    (s/p, dp — ds reuses s's slot but budget it anyway), one bf16 ds, and
    two fp32 (hd, L) dk/dv accumulators.
    """
    hd = d // h
    if h * hd != d or hd % 8 != 0:
        return None
    if l < 512 or l % 256 != 0:
        return None
    for g in (1, 2, 4, 8, 16):
        if g > h or h % g != 0:
            continue
        dg = d // g
        for bq in (512, 256):
            # bq must divide L: the kernels write exactly l // bq query
            # blocks, so a non-divisible bq would leave the tail of oT
            # (and dq/dk/dv) unwritten — e.g. L=768 with bq=512.
            if bq > l or l % bq:
                continue
            est = (
                2 * 7 * dg * l * 2          # double-buffered bf16 I/O blocks
                + 3 * 4 * bq * l            # fp32 s/p, dp, ds-budget
                + 2 * bq * l                # bf16 ds
                + 2 * 4 * hd * l            # fp32 dk/dv accumulators
            )
            if est <= _VMEM_BUDGET:
                return g, bq
    return None


def supports(h: int, l: int, head_dim: int) -> bool:
    """True when the blocked kernel covers this (heads, seq, head_dim).

    Same argument convention as flash_batched.supports (head_dim, not the
    full hidden width).
    """
    return _plan(h, l, h * head_dim) is not None


def _fwd_kernel(qT_ref, kT_ref, vT_ref, oT_ref, *, scale, hg, hd, bq):
    l = qT_ref.shape[2]
    for h in range(hg):
        rows = slice(h * hd, (h + 1) * hd)
        qT = qT_ref[0, rows, :]   # (hd, L)
        kT = kT_ref[0, rows, :]
        vT = vT_ref[0, rows, :]
        for qb in range(l // bq):
            cols = slice(qb * bq, (qb + 1) * bq)
            # s_ij = sum_d qT_di kT_dj : contract the sublane (d) dim
            s = jax.lax.dot_general(
                qT[:, cols], kT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (bq, L)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            pb = (p / denom).astype(vT.dtype)
            # oT_di = sum_j vT_dj p_ij -> (hd, bq)
            oTb = jax.lax.dot_general(
                vT, pb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            oT_ref[0, rows, cols] = oTb.astype(oT_ref.dtype)


def _bwd_kernel(qT_ref, kT_ref, vT_ref, doT_ref,
                dqT_ref, dkT_ref, dvT_ref, *, scale, hg, hd, bq):
    l = qT_ref.shape[2]
    for h in range(hg):
        rows = slice(h * hd, (h + 1) * hd)
        qT = qT_ref[0, rows, :]
        kT = kT_ref[0, rows, :]
        vT = vT_ref[0, rows, :]
        doTh = doT_ref[0, rows, :]
        dk_acc = jnp.zeros((hd, l), jnp.float32)
        dv_acc = jnp.zeros((hd, l), jnp.float32)
        for qb in range(l // bq):
            cols = slice(qb * bq, (qb + 1) * bq)
            qTb = qT[:, cols]
            doTb = doTh[:, cols]
            s = jax.lax.dot_general(
                qTb, kT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (bq, L)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = e / denom  # fp32 probs, recomputed
            pb = p.astype(vT.dtype)
            # recompute oT for the delta term: (hd, bq)
            oTb = jax.lax.dot_general(
                vT, pb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(
                doTb.astype(jnp.float32) * oTb, axis=0, keepdims=True
            )  # (1, bq)
            # dvT_dj += sum_i doT_di p_ij
            dv_acc = dv_acc + jax.lax.dot_general(
                doTb, pb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dp_ij = sum_d doT_di vT_dj
            dp = jax.lax.dot_general(
                doTb, vT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta.T) * scale).astype(qT.dtype)  # (bq, L)
            # dqT_di = sum_j kT_dj ds_ij -> (hd, bq)
            dqTb = jax.lax.dot_general(
                kT, ds, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqT_ref[0, rows, cols] = dqTb.astype(dqT_ref.dtype)
            # dkT_dj += sum_i qT_di ds_ij
            dk_acc = dk_acc + jax.lax.dot_general(
                qTb, ds, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dkT_ref[0, rows, :] = dk_acc.astype(dkT_ref.dtype)
        dvT_ref[0, rows, :] = dv_acc.astype(dvT_ref.dtype)


def _qkv_specs(dg: int, l: int, g: int):
    """Three views of the same (N, 3D, L) array: q/k/v row-blocks of
    group gg live at block-row gg, g+gg, 2g+gg respectively."""
    mk = lambda base: pl.BlockSpec(
        (1, dg, l), lambda i, gg, base=base: (i, base + gg, 0),
        memory_space=pltpu.VMEM,
    )
    return [mk(0), mk(g), mk(2 * g)]


def _out_spec(dg: int, l: int):
    return pl.BlockSpec(
        (1, dg, l), lambda i, gg: (i, gg, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def packed_attention_big(
    qkv: jax.Array, num_heads: int, scale: float
) -> jax.Array:
    """(N, L, 3D) packed qkv -> (N, L, D) attention output, L >= 512."""
    out, _ = _big_fwd(qkv, num_heads, scale)
    return out


def _big_fwd(qkv, num_heads, scale):
    n, l, three_d = qkv.shape
    d = three_d // 3
    g, bq = _plan(num_heads, l, d)
    dg = d // g
    qkvT = jnp.swapaxes(qkv, 1, 2)  # (N, 3D, L)
    oT = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, hg=num_heads // g, hd=d // num_heads,
            bq=bq,
        ),
        grid=(n, g),
        in_specs=_qkv_specs(dg, l, g),
        out_specs=_out_spec(dg, l),
        out_shape=jax.ShapeDtypeStruct((n, d, l), qkv.dtype),
        interpret=interpret_mode(),
    )(qkvT, qkvT, qkvT)
    return jnp.swapaxes(oT, 1, 2), qkvT


def _big_bwd(num_heads, scale, qkvT, gout):
    n, three_d, l = qkvT.shape
    d = three_d // 3
    g, bq = _plan(num_heads, l, d)
    dg = d // g
    doT = jnp.swapaxes(gout, 1, 2).astype(qkvT.dtype)  # (N, D, L)
    out_sd = jax.ShapeDtypeStruct((n, d, l), qkvT.dtype)
    dqT, dkT, dvT = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, hg=num_heads // g, hd=d // num_heads,
            bq=bq,
        ),
        grid=(n, g),
        in_specs=_qkv_specs(dg, l, g) + [_out_spec(dg, l)],
        out_specs=[_out_spec(dg, l)] * 3,
        out_shape=[out_sd] * 3,
        interpret=interpret_mode(),
    )(qkvT, qkvT, qkvT, doT)
    dqkvT = jnp.concatenate([dqT, dkT, dvT], axis=1)  # (N, 3D, L)
    return (jnp.swapaxes(dqkvT, 1, 2),)


packed_attention_big.defvjp(_big_fwd, _big_bwd)
