"""Flash attention kernel vs reference math (interpreter mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskdit_tpu.ops import flash
from maskdit_tpu.ops.attention import mha_reference


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels interpreted (no TPU in CI)."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


@pytest.mark.parametrize("hd", [32, 72, 128])
def test_flash_forward_matches_reference(hd):
    n, h, l = 2, 2, 128
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )
    out = flash.flash_mha(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_backward_matches_reference():
    n, h, l, hd = 1, 2, 128, 32
    rng = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash.flash_mha(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_reference(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


def test_flash_fallback_unaligned_length():
    """L not divisible by 128 silently uses the reference path."""
    n, h, l, hd = 1, 1, 100, 32
    rng = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )
    out = flash.flash_mha(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    n, h, l, hd = 2, 4, 256, 72
    rng = jax.random.PRNGKey(3)
    q, k, v = (
        jax.random.normal(
            jax.random.fold_in(rng, i), (n, h, l, hd), jnp.bfloat16
        )
        for i in range(3)
    )
    out = flash.flash_mha(q, k, v)
    ref = mha_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
