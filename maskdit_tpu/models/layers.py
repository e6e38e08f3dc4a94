"""Building-block layers for the masked DiT.

Flax/linen re-designs of the reference components in models/maskdit.py:
TimestepEmbedder (:27-65), LabelEmbedder (:68-81), DiTBlock (:170-192),
DecoderLayer (:195-213), FinalLayer (:216-234), PatchEmbed (timm), and the
fixed 2D sin-cos positional embeddings (:595-642).

Parameter layout conventions (for the torch->jax weight converter in
maskdit_tpu.utils.port):
  * Dense kernels are (in, out) == torch weight transposed.
  * PatchEmbed kernel is (p, p, C, D) "HWIO" == torch conv weight
    permuted (2, 3, 1, 0).
  * adaLN 6-way modulation keeps the reference chunk order
    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp)
    along the output dimension (reference: maskdit.py:189).

Numerics: parameters are fp32; matmuls run in ``dtype`` (bf16 on TPU);
LayerNorm statistics and softmax run in fp32.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.ops.attention import mha

Initializer = Callable[..., jax.Array]

xavier_uniform = nn.initializers.xavier_uniform()
normal_002 = nn.initializers.normal(stddev=0.02)
zeros_init = nn.initializers.zeros


def gelu_tanh(x: jax.Array) -> jax.Array:
    """GELU with the tanh approximation, bit-matching torch's
    ``gelu(approximate='tanh')`` (jax.nn.gelu uses a different internal
    formulation that deviates by ~3e-5)."""
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * jnp.square(x) * x)))


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN shift/scale application (reference: maskdit.py:19-20)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def layer_norm_no_affine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm without learnable affine, stats in fp32.

    Matches nn.LayerNorm(..., elementwise_affine=False, eps=1e-6)
    (reference: maskdit.py:177). torch normalizes by the *biased* variance.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embeddings, [cos | sin] order.

    Reference: TimestepEmbedder.timestep_embedding (maskdit.py:41-60).
    Always computed in fp32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False, extra_tokens: int = 1
) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding table (numpy, fp64 internally).

    Bit-for-bit the same values as the reference
    (get_2d_sincos_pos_embed, maskdit.py:595-642).
    """
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # (2, H, W), w first
    grid = grid.reshape([2, 1, grid_size, grid_size])

    def emb_1d(dim: int, pos: np.ndarray) -> np.ndarray:
        assert dim % 2 == 0
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    assert embed_dim % 2 == 0
    emb = np.concatenate(
        [emb_1d(embed_dim // 2, grid[0]), emb_1d(embed_dim // 2, grid[1])], axis=1
    )
    if cls_token and extra_tokens > 0:
        emb = np.concatenate([np.zeros([extra_tokens, embed_dim]), emb], axis=0)
    return emb.astype(np.float32)


class TimestepEmbedder(nn.Module):
    """Freq embed (256-d) -> Linear -> SiLU -> Linear (reference: :27-65)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        t_freq = timestep_embedding(t, self.frequency_embedding_size)
        h = nn.Dense(
            self.hidden_size, kernel_init=normal_002, bias_init=zeros_init,
            dtype=self.dtype, name="fc1",
        )(t_freq.astype(self.dtype))
        h = nn.silu(h)
        return nn.Dense(
            self.hidden_size, kernel_init=normal_002, bias_init=zeros_init,
            dtype=self.dtype, name="fc2",
        )(h)


class LabelEmbedder(nn.Module):
    """Linear (no bias) on one-hot / soft label vectors (reference: :68-81).

    Being a Linear on one-hot rather than an embedding table makes the CFG
    null class exactly the zero vector (y=0 rows embed to 0).
    """

    num_classes: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        return nn.Dense(
            self.hidden_size, use_bias=False, kernel_init=normal_002,
            dtype=self.dtype, name="embedding_table",
        )(y.astype(self.dtype))


class PatchEmbed(nn.Module):
    """Patchify + linear projection, equivalent to timm PatchEmbed's conv.

    Implemented as reshape + one big matmul (MXU-friendly; a p-stride conv
    and this matmul are the same linear map). Input is NCHW to mirror the
    reference API (maskdit.py:278); kernel stored HWIO.
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, c, h, w = x.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, f"input {h}x{w} not divisible by patch {p}"
        kernel = self.param(
            "kernel",
            lambda key, shape: _patch_kernel_init(key, shape),
            (p, p, c, self.embed_dim),
        )
        bias = self.param("bias", zeros_init, (self.embed_dim,))
        # (N,C,H,W) -> (N, h, p, w, p, C) -> (N, h*w, p*p*C) with (ph, pw, c)
        # ordering inside each patch (matches torch conv's (c,ph,pw) weight
        # layout after the HWIO permutation).
        x = x.transpose(0, 2, 3, 1).reshape(n, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, (h // p) * (w // p), p * p * c)
        y = jnp.dot(
            x.astype(self.dtype),
            kernel.reshape(p * p * c, self.embed_dim).astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)


def _patch_kernel_init(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """xavier_uniform over the flattened (out, in) view.

    The reference initializes the patch conv like an nn.Linear
    (maskdit.py:349-352): xavier on w.view(out, -1), i.e. fan_in = p*p*C.
    """
    p, q, c, d = shape
    flat = nn.initializers.xavier_uniform()(key, (p * q * c, d))
    return flat.reshape(shape)


class Attention(nn.Module):
    """timm-style MHA: packed qkv Dense, scaled dot-product, out proj."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, kv_valid: jax.Array | None = None) -> jax.Array:
        n, l, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(
            3 * d, kernel_init=xavier_uniform, bias_init=zeros_init,
            dtype=self.dtype, name="qkv",
        )(x)
        from jax.ad_checkpoint import checkpoint_name

        qkv = checkpoint_name(qkv, "qkv_out")

        # timm packs qkv as (3, H, hd) along the out dim (reference
        # maskdit.py:178), but for the packed_attention kernels we want
        # (H, hd) contiguous per q/k/v — the Dense above already emits
        # [q | k | v] along the feature axis in that order, matching
        # jnp.split inside the kernel wrapper.
        #
        # use_flash semantics: None = auto (packed Pallas kernel where a
        # variant supports the shape, else the mha dispatcher's own
        # auto rule); True = explicitly request the ops/flash.py
        # streaming kernel via mha; False = plain jnp path.
        # MIGRATION NOTE (round 3): before this, True *also* engaged the
        # packed kernel. A config that opted in with `use_flash: true` to
        # get the auto-dispatched kernels should now say nothing (or
        # null): True is reserved for explicitly forcing ops/flash.py,
        # which loses to the packed kernels at L<=512.
        from maskdit_tpu.ops import flash_batched, flash_big
        from maskdit_tpu.ops.dispatch import ambient_mesh, shard_safe_kernel

        auto = kv_valid is None and self.use_flash is None
        on_tpu = jax.default_backend() == "tpu"
        kernel_fn = None
        if auto and on_tpu and flash_batched.supports(self.num_heads, l, hd):
            # whole-(L,3D)-block kernel, the short-sequence winner
            # (256-res shapes): (L, L) logits/probs never leave VMEM; the
            # custom VJP keeps only this qkv buffer as residual and the
            # bwd kernel recomputes softmax internally.
            kernel_fn = lambda t: flash_batched.packed_attention(
                t, self.num_heads, hd ** -0.5
            )
        elif auto and on_tpu and flash_big.supports(self.num_heads, l, hd):
            # head-grouped, query-chunked variant for the 512-res shapes
            # (encoder L=512, decoder L=1024) — same qkv-only residual.
            kernel_fn = lambda t: flash_big.packed_attention_big(
                t, self.num_heads, hd ** -0.5
            )
        if kernel_fn is not None:
            # Shard safety (VERDICT r3 #5): a Pallas custom call has no
            # SPMD rule, so under a sharded mesh it runs inside shard_map
            # over the batch-sharded axes (per-sample grid -> local calls)
            # or, when no gather-free mapping exists (tensor>1), falls
            # back to the XLA path below. See ops/dispatch.py.
            kernel_fn = shard_safe_kernel(kernel_fn, ambient_mesh(), n)
        if kernel_fn is not None:
            out = kernel_fn(qkv)
        else:
            def attn_from_qkv(qkv_packed, kv_valid):
                qkv_r = qkv_packed.reshape(
                    n, l, 3, self.num_heads, hd
                ).transpose(2, 0, 3, 1, 4)
                q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]  # each (N, H, L, hd)
                o = mha(q, k, v, use_flash=self.use_flash, kv_valid=kv_valid)
                return o.transpose(0, 2, 1, 3).reshape(n, l, d)

            # Recompute attention in the backward pass instead of saving
            # its internals: autodiff would otherwise keep the fp32
            # softmax output — (N, H, L, L) fp32 per block, ~2.9 GB/step
            # for XL/2 at bs48. With the checkpoint, the only attention
            # residual is the qkv buffer the named save keeps anyway.
            out = jax.checkpoint(attn_from_qkv)(qkv, kv_valid)
        return nn.Dense(
            d, kernel_init=xavier_uniform, bias_init=zeros_init,
            dtype=self.dtype, name="proj",
        )(out)


class Mlp(nn.Module):
    """fc1 -> GELU(tanh) -> fc2 (timm Mlp used at reference :182)."""

    hidden_size: int
    mlp_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from jax.ad_checkpoint import checkpoint_name

        h = nn.Dense(
            self.mlp_hidden, kernel_init=xavier_uniform, bias_init=zeros_init,
            dtype=self.dtype, name="fc1",
        )(x)
        h = checkpoint_name(h, "fc1_out")
        h = gelu_tanh(h)
        return nn.Dense(
            self.hidden_size, kernel_init=xavier_uniform, bias_init=zeros_init,
            dtype=self.dtype, name="fc2",
        )(h)


class DiTBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero conditioning.

    Reference: models/maskdit.py:170-192. The 6-way modulation projection is
    zero-initialized so each block starts as identity (maskdit.py:374-377).
    """

    hidden_size: int
    c_emb_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array,
                 kv_valid: jax.Array | None = None) -> jax.Array:
        mod = nn.Dense(
            6 * self.hidden_size, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        from jax.ad_checkpoint import checkpoint_name

        # names let a save_only_these_names remat policy keep exactly the
        # matmul inputs (h_msa/h_mlp) + attention output, recomputing the
        # cheap LN/modulate chains in the backward pass
        h = modulate(layer_norm_no_affine(x), shift_msa, scale_msa)
        h = checkpoint_name(h, "h_msa")
        attn_out = Attention(
            self.hidden_size, self.num_heads, dtype=self.dtype,
            use_flash=self.use_flash, name="attn",
        )(h, kv_valid)
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = x + gate_msa[:, None, :] * attn_out

        h = modulate(layer_norm_no_affine(x), shift_mlp, scale_mlp)
        h = checkpoint_name(h, "h_mlp")
        mlp_out = Mlp(
            self.hidden_size, int(self.hidden_size * self.mlp_ratio),
            dtype=self.dtype, name="mlp",
        )(h)
        mlp_out = checkpoint_name(mlp_out, "mlp_out")
        return x + gate_mlp[:, None, :] * mlp_out


class DecoderLayer(nn.Module):
    """Encoder->decoder projection: adaLN(2-way) + Linear hidden->dec_hidden.

    Reference: models/maskdit.py:195-213; zero-initialized (maskdit.py:403-408).
    """

    hidden_size: int
    decoder_hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = nn.Dense(
            2 * self.hidden_size, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(layer_norm_no_affine(x), shift, scale)
        return nn.Dense(
            self.decoder_hidden_size, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="linear",
        )(x)


class FinalLayer(nn.Module):
    """adaLN(2-way) + Linear -> patch^2 * out_channels (reference: :216-234).

    Zero-initialized (maskdit.py:380-383) so the raw model output starts at 0.
    """

    final_hidden_size: int
    c_emb_size: int
    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = nn.Dense(
            2 * self.final_hidden_size, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(layer_norm_no_affine(x), shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="linear",
        )(x)
