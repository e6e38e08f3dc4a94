"""Multi-head attention ops for packed token sequences.

The sequence lengths here are short (<= 1024 full tokens; 512 packed at mask
0.5 — see SURVEY.md §5 long-context row), so attention is MXU-bound rather
than memory-bound. The default path is a plain jnp implementation that XLA
fuses well; ``maskdit_tpu.ops.flash`` provides a Pallas fused kernel that is
selected automatically on TPU for shapes where it wins.

All softmax math runs in fp32 regardless of the compute dtype (bf16 inputs
are upcast), matching the numerics of the reference's fp16-AMP attention
(torch autocasts softmax to fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def mha_reference(
    q: jax.Array, k: jax.Array, v: jax.Array,
    kv_valid: jax.Array | None = None,
) -> jax.Array:
    """Plain multi-head attention.

    q, k, v: (N, H, L, hd). Returns (N, H, L, hd) in q.dtype.
    Matches the math of timm's Attention used by the reference DiTBlock
    (reference: models/maskdit.py:178).

    kv_valid: optional traced scalar — only key/value positions < kv_valid
    participate (the pad-to-max masking path); queries beyond kv_valid
    produce values that callers must discard.
    """
    hd = q.shape[-1]
    scale = hd ** -0.5
    logits = jnp.einsum(
        "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_valid is not None:
        cols = jnp.arange(k.shape[2])
        logits = jnp.where(
            (cols < kv_valid)[None, None, None, :], logits, -jnp.inf
        )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "nhqk,nhkd->nhqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        from maskdit_tpu.ops import flash  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mha(
    q: jax.Array, k: jax.Array, v: jax.Array,
    use_flash: bool | None = None,
    kv_valid: jax.Array | None = None,
) -> jax.Array:
    """Dispatching attention entry point used by the model layer.

    use_flash: force (True) / forbid (False) the Pallas kernel; None = auto.
    Measured on v5e: XLA's fused attention wins at short L (<=512), the
    Pallas kernel wins from L=1024 (fwd 3.9 vs 4.8 ms, bwd 8.1 vs 9.8 ms at
    (16,16,1024,72) bf16) — so auto enables the kernel at L >= 1024.

    kv_valid (pad-to-max masking) routes to the jnp path, which supports
    the dynamic key mask.
    """
    if kv_valid is not None:
        return mha_reference(q, k, v, kv_valid=kv_valid)
    if use_flash is None:
        l = q.shape[2]
        use_flash = (
            l >= 1024 and _flash_available() and l % 128 == 0
        )
    if use_flash:
        from maskdit_tpu.ops import flash

        return flash.flash_mha(q, k, v)
    return mha_reference(q, k, v)
