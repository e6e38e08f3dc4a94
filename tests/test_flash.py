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


# ---------------------------------------------------------------------------
# batched-head kernel (ops/flash_batched.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hd,l", [(32, 256), (72, 128)])
def test_flash_batched_forward_matches_reference(hd, l):
    from maskdit_tpu.ops import flash_batched

    n, h = 2, 4
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )
    out = flash_batched.flash_mha_batched(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_batched_backward_matches_reference():
    from maskdit_tpu.ops import flash_batched

    n, h, l, hd = 1, 3, 128, 32
    rng = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_batched.flash_mha_batched(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_reference(q, k, v)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


def test_flash_batched_supports_window():
    from maskdit_tpu.ops import flash_batched

    assert flash_batched.supports(16, 128, 72)     # XL/2 encoder @256
    assert flash_batched.supports(16, 256, 32)     # XL/2 decoder @256
    # 512-res shapes exceed the VMEM budget for full-L blocks: the L=512
    # encoder falls back to the XLA path, L=1024 to ops/flash.py
    assert not flash_batched.supports(16, 512, 72)
    assert not flash_batched.supports(16, 192, 72)  # unaligned L
    assert not flash_batched.supports(16, 1024, 72)


def test_attention_layer_kernel_path_matches_jnp(monkeypatch):
    """The Attention module's packed_attention wiring (q|k|v split order,
    scale, output layout) must match the jnp fallback path exactly —
    value AND gradient."""
    import flax.linen as nn
    from maskdit_tpu.models.layers import Attention

    # the layer gates the kernel on a TPU backend; tests run on CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    n, l, d, h = 2, 128, 96, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n, l, d))
    attn_k = Attention(d, h, dtype=jnp.float32)          # kernel path
    attn_j = Attention(d, h, dtype=jnp.float32, use_flash=False)
    params = attn_k.init(jax.random.PRNGKey(1), x)

    def loss(mod, p, x):
        return jnp.sum(jnp.sin(mod.apply(p, x)))

    yk = attn_k.apply(params, x)
    yj = attn_j.apply(params, x)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yj), atol=2e-5)
    gk = jax.grad(lambda p: loss(attn_k, p, x))(params)
    gj = jax.grad(lambda p: loss(attn_j, p, x))(params)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


# ---------------------------------------------------------------------------
# blocked big-shape kernel (ops/flash_big.py)
# ---------------------------------------------------------------------------

def _pack_qkv(q, k, v):
    n, h, l, hd = q.shape

    def pack(x):
        return x.transpose(0, 2, 1, 3).reshape(n, l, h * hd)

    return jnp.concatenate([pack(q), pack(k), pack(v)], axis=-1)


def _unpack_o(o, h):
    n, l, d = o.shape
    return o.reshape(n, l, h, d // h).transpose(0, 2, 1, 3)


@pytest.mark.parametrize(
    "h,l,hd",
    [
        (4, 512, 72),   # encoder-512 shape family (grouped heads)
        (4, 1024, 32),  # decoder-1024 shape family (q-chunked)
        (2, 512, 8),    # minimal head_dim
        # L=768: odd multiple of 256. Regression for the _plan bug where
        # bq=512 could be picked with l % bq != 0, leaving the query
        # tail of oT (and dq/dk/dv) unwritten.
        (2, 768, 8),
        (2, 1024, 72),  # unmasked-finetune-512 encoder shape family
    ],
)
def test_flash_big_forward_matches_reference(h, l, hd):
    from maskdit_tpu.ops import flash_big

    assert flash_big.supports(h, l, hd)
    n = 1
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        0.3 * jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )
    qkv = _pack_qkv(q, k, v)
    out = flash_big.packed_attention_big(qkv, h, hd ** -0.5)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(_unpack_o(out, h)), np.asarray(ref), atol=2e-5
    )


@pytest.mark.parametrize(
    "h,l,hd", [(2, 512, 72), (2, 1024, 32), (2, 768, 8), (2, 1024, 72)]
)
def test_flash_big_backward_matches_reference(h, l, hd):
    from maskdit_tpu.ops import flash_big

    n = 1
    rng = jax.random.PRNGKey(1)
    q, k, v = (
        0.3 * jax.random.normal(jax.random.fold_in(rng, i), (n, h, l, hd))
        for i in range(3)
    )
    qkv = _pack_qkv(q, k, v)
    scale = hd ** -0.5

    def loss_big(qkv):
        return jnp.sum(jnp.sin(flash_big.packed_attention_big(qkv, h, scale)))

    def loss_ref(qkv):
        qr = qkv.reshape(n, l, 3, h, hd).transpose(2, 0, 3, 1, 4)
        o = mha_reference(qr[0], qr[1], qr[2])
        return jnp.sum(jnp.sin(o.transpose(0, 2, 1, 3).reshape(n, l, h * hd)))

    g_big = jax.grad(loss_big)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_big), np.asarray(g_ref), atol=5e-5)


def test_flash_big_supports_window():
    from maskdit_tpu.ops import flash_big

    assert flash_big.supports(16, 512, 72)    # XL/2 encoder @512, mask 0.5
    assert flash_big.supports(16, 1024, 32)   # XL/2 decoder @512
    assert flash_big.supports(16, 1024, 72)   # XL/2 encoder, unmasked 512
    assert not flash_big.supports(16, 128, 72)   # short L: flash_batched's job
    assert not flash_big.supports(16, 640, 72)   # L not a multiple of 256
    # a chosen block_q must divide L (L=768 must not plan bq=512)
    from maskdit_tpu.ops.flash_big import _plan
    plan = _plan(2, 768, 2 * 8)
    assert plan is not None and 768 % plan[1] == 0
    assert not flash_big.supports(16, 512, 12)   # head_dim not 8-aligned
