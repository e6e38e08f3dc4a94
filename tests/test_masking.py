"""Unit tests for token masking (gather/scatter round-trips, mask stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskdit_tpu.models import masking


def test_len_keep():
    assert masking.len_keep_for(1024, 0.5) == 512
    assert masking.len_keep_for(256, 0.5) == 128
    assert masking.len_keep_for(256, 0.0) == 256
    assert masking.len_keep_for(10, 0.75) == 2  # int() truncation like reference


@pytest.mark.parametrize("ratio", [0.25, 0.5, 0.75])
def test_random_mask_invariants(ratio):
    rng = jax.random.PRNGKey(0)
    batch, length = 4, 64
    info = masking.random_mask(rng, batch, length, ratio)
    len_keep = masking.len_keep_for(length, ratio)

    assert info.ids_keep.shape == (batch, len_keep)
    assert info.ids_restore.shape == (batch, length)
    assert info.mask.shape == (batch, length)

    # mask: 0 = keep, 1 = drop; exactly length - len_keep dropped per sample
    np.testing.assert_array_equal(
        np.asarray(info.mask.sum(axis=1)), np.full(batch, length - len_keep)
    )
    # kept positions have mask == 0
    mask_np = np.asarray(info.mask)
    keep_np = np.asarray(info.ids_keep)
    for b in range(batch):
        assert mask_np[b, keep_np[b]].sum() == 0
        # ids_restore is the inverse permutation of the shuffle
        assert sorted(np.asarray(info.ids_restore)[b].tolist()) == list(range(length))


def test_gather_scatter_roundtrip():
    """scatter(gather(x)) restores kept tokens in place, mask_token elsewhere."""
    rng = jax.random.PRNGKey(1)
    batch, length, dim = 3, 32, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, length, dim))
    info = masking.random_mask(rng, batch, length, 0.5)

    packed = masking.gather_tokens(x, info.ids_keep)
    assert packed.shape == (batch, 16, dim)

    mask_token = jnp.full((1, 1, dim), 7.0)
    restored = masking.scatter_tokens(packed, info.ids_restore, mask_token)
    restored = np.asarray(restored)
    x_np = np.asarray(x)
    mask_np = np.asarray(info.mask)
    for b in range(batch):
        for l in range(length):
            if mask_np[b, l] == 0:
                np.testing.assert_allclose(restored[b, l], x_np[b, l], rtol=1e-6)
            else:
                np.testing.assert_allclose(restored[b, l], 7.0)


def test_scatter_with_extras():
    """Leading cls tokens pass through unshuffled (reference extras path)."""
    batch, length, dim = 2, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, length, dim))
    info = masking.random_mask(jax.random.PRNGKey(4), batch, length, 0.5)
    packed = masking.gather_tokens(x, info.ids_keep)
    cls = jnp.full((batch, 1, dim), -3.0)
    packed_with_cls = jnp.concatenate([cls, packed], axis=1)
    restored = masking.scatter_tokens(
        packed_with_cls, info.ids_restore, jnp.zeros((1, 1, dim)), extras=1
    )
    assert restored.shape == (batch, length + 1, dim)
    np.testing.assert_allclose(np.asarray(restored[:, 0]), -3.0)


def test_mask_matches_argsort_reference():
    """Our rank-based mask equals the reference's scatter+gather construction."""
    rng = jax.random.PRNGKey(5)
    batch, length, ratio = 8, 64, 0.5
    len_keep = masking.len_keep_for(length, ratio)
    noise = jax.random.uniform(rng, (batch, length))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    # reference construction (maskdit.py:108-110): ones, zero the first
    # len_keep slots, then gather by ids_restore
    ref_mask = jnp.ones((batch, length)).at[:, :len_keep].set(0)
    ref_mask = jnp.take_along_axis(ref_mask, ids_restore, axis=1)
    ours = (ids_restore >= len_keep).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref_mask), np.asarray(ours))
