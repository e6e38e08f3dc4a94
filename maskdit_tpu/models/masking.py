"""Token masking / unmasking primitives — the core FLOP-saving trick.

TPU-native reimplementation of the reference's per-sample random masking
(reference: models/maskdit.py:88-163). Per-sample shuffles come from an
argsort of uniform noise; kept tokens are gathered into a *dense* packed
buffer of static length ``len_keep`` so that every downstream matmul runs on
a fixed shape the XLA tiler can map straight onto the MXU.

Design notes vs the reference:
  * ``mask_ratio`` is a static Python float — ``len_keep`` is resolved at
    trace time, so the packed encoder sequence (N, len_keep, D) has a static
    shape. Schedule-varying ratios cause one recompilation per distinct
    ratio; the trainer buckets schedule outputs to limit this (the released
    MaskDiT configs all use constant 0.5).
  * the binary mask is derived directly from the rank permutation
    (``ids_restore < len_keep``) instead of scatter+gather of a ones tensor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class MaskInfo(NamedTuple):
    """Static-shape masking metadata.

    mask:        (N, L) float — 0 = keep, 1 = drop (reference convention,
                 models/maskdit.py:97).
    ids_keep:    (N, len_keep) int32 — indices of kept tokens.
    ids_restore: (N, L) int32 — rank of each position in the shuffle; used to
                 scatter decoder tokens back to their original positions.
    len_keep:    None for the packed-exact path (width = ids_keep.shape[1]);
                 a traced int32 scalar for the pad-to-max path, where
                 ids_keep is padded to a fixed maximum width and only the
                 first len_keep tokens are valid (see padded_random_mask).
    """

    mask: jax.Array
    ids_keep: jax.Array
    ids_restore: jax.Array
    len_keep: Optional[jax.Array] = None


def len_keep_for(length: int, mask_ratio: float) -> int:
    """Number of tokens kept by the encoder (reference: maskdit.py:101)."""
    return int(length * (1.0 - float(mask_ratio)))


def random_mask(rng: jax.Array, batch: int, length: int, mask_ratio: float) -> MaskInfo:
    """Draw per-sample random masks (reference: get_mask, maskdit.py:88-113).

    Shuffle = argsort of U[0,1) noise; the first ``len_keep`` ranks are kept.
    """
    len_keep = len_keep_for(length, mask_ratio)
    noise = jax.random.uniform(rng, (batch, length))
    ids_shuffle = jnp.argsort(noise, axis=1).astype(jnp.int32)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :len_keep]
    # position p is kept iff its rank (= ids_restore[p]) < len_keep
    mask = (ids_restore >= len_keep).astype(jnp.float32)
    return MaskInfo(mask=mask, ids_keep=ids_keep, ids_restore=ids_restore)


def padded_random_mask(
    rng: jax.Array, batch: int, length: int, len_max: int,
    len_keep: jax.Array,
) -> MaskInfo:
    """Pad-to-max masking: one compiled program serves every mask ratio.

    ``len_max`` is static (the most tokens any schedule value keeps);
    ``len_keep`` is a traced scalar. ids_keep always has width len_max —
    its first len_keep columns are the kept tokens, the rest are padding
    drawn from the same shuffle. Downstream, attention masks out key
    positions >= len_keep and the decoder scatter routes only ranks <
    len_keep back (padded tail tokens never influence valid outputs), so
    the math equals the packed-exact path at the same ratio while avoiding
    one recompile per schedule bucket (SURVEY.md §7 'hard parts';
    VERDICT r1 weak #7).
    """
    len_keep = jnp.asarray(len_keep, jnp.int32)
    noise = jax.random.uniform(rng, (batch, length))
    ids_shuffle = jnp.argsort(noise, axis=1).astype(jnp.int32)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :len_max]
    mask = (ids_restore >= len_keep).astype(jnp.float32)
    return MaskInfo(
        mask=mask, ids_keep=ids_keep, ids_restore=ids_restore,
        len_keep=len_keep,
    )


def gather_tokens(x: jax.Array, ids_keep: jax.Array) -> jax.Array:
    """Pack kept tokens densely: (N, L, D) -> (N, len_keep, D).

    Reference: mask_out_token, maskdit.py:116-127.
    """
    return jnp.take_along_axis(x, ids_keep[..., None], axis=1)


def scatter_tokens(
    x: jax.Array,
    ids_restore: jax.Array,
    mask_token: jax.Array,
    extras: int = 0,
) -> jax.Array:
    """Restore packed tokens to full length, filling holes with mask_token.

    Reference: unmask_tokens, maskdit.py:157-163. ``x`` is
    (N, len_keep + extras, D); extras leading tokens (cls) are carried
    through unshuffled. ``mask_token`` broadcasts from (1, 1, D) (or any
    shape broadcastable to (N, n_masked, D)).
    """
    n, t, d = x.shape
    full_len = ids_restore.shape[1]
    n_masked = full_len + extras - t
    mask_toks = jnp.broadcast_to(mask_token.astype(x.dtype), (n, n_masked, d))
    x_ = jnp.concatenate([x[:, extras:, :], mask_toks], axis=1)
    x_ = jnp.take_along_axis(x_, ids_restore[..., None], axis=1)
    if extras:
        x_ = jnp.concatenate([x[:, :extras, :], x_], axis=1)
    return x_


def scatter_tokens_padded(
    x: jax.Array,
    ids_restore: jax.Array,
    mask_token: jax.Array,
    len_keep: jax.Array,
    extras: int = 0,
) -> jax.Array:
    """Pad-to-max variant of scatter_tokens.

    ``x`` holds len_max (+extras) tokens of which only the first len_keep
    (traced) are valid; positions whose shuffle rank >= len_keep receive
    ``mask_token`` — including ranks that point into the padded tail, so
    garbage tokens never leak into the restored sequence.
    """
    n, t, d = x.shape
    body = x[:, extras:, :]
    tok = jnp.broadcast_to(mask_token.astype(x.dtype), (n, 1, d))
    pool = jnp.concatenate([body, tok], axis=1)  # index len_max -> mask token
    idx = jnp.where(ids_restore < len_keep, ids_restore, body.shape[1])
    x_ = jnp.take_along_axis(pool, idx[..., None], axis=1)
    if extras:
        x_ = jnp.concatenate([x[:, :extras, :], x_], axis=1)
    return x_
