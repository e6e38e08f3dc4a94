"""Per-seed random generators for reproducible batched sampling.

TPU-native equivalent of the reference's StackedRandomGenerator
(reference: utils.py:119-133): each sample in a batch draws from its own
seed-keyed stream, so generated images depend only on their seed, never on
batch composition or rank assignment. The reference achieves this with one
torch.Generator per sample; here each sample gets its own fold_in-derived
JAX PRNG key and draws are vmapped.

Streams differ numerically from torch's (different PRNG), so FID parity with
reference checkpoints is statistical, not bitwise (SURVEY.md §7 RNG parity).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class StackedRandomGenerator:
    """Batched per-seed generator.

    Each call consumes one round: draw i of sample s comes from
    fold_in(PRNGKey(seed_s), i), making the sequence of calls reproducible
    regardless of how many draws each call makes.
    """

    def __init__(self, seeds: Sequence[int]):
        seeds = np.asarray(
            [int(s) % (1 << 32) for s in seeds], dtype=np.uint32
        )
        self._keys = jax.vmap(lambda s: jax.random.PRNGKey(s))(jnp.asarray(seeds))
        self._round = 0
        self.batch_size = len(seeds)

    def _next_keys(self) -> jax.Array:
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            self._keys, self._round
        )
        self._round += 1
        return keys

    def randn(self, size: Sequence[int], dtype=jnp.float32) -> jax.Array:
        """Normal draws of shape ``size``; size[0] must equal batch size."""
        assert size[0] == self.batch_size, (size, self.batch_size)
        keys = self._next_keys()
        return jax.vmap(
            lambda k: jax.random.normal(k, tuple(size[1:]), dtype)
        )(keys)

    def randn_like(self, x: jax.Array) -> jax.Array:
        return self.randn(x.shape, x.dtype)

    def randint(self, maxval: int, size: Sequence[int], dtype=jnp.int32) -> jax.Array:
        assert size[0] == self.batch_size, (size, self.batch_size)
        keys = self._next_keys()
        return jax.vmap(
            lambda k: jax.random.randint(k, tuple(size[1:]), 0, maxval, dtype)
        )(keys)
