"""Frozen Stable-Diffusion VAE (AutoencoderKL f=8, z=4ch) in Flax.

TPU-native rebuild of the reference's autoencoder.py (FrozenAutoencoderKL,
autoencoder.py:412-479): GroupNorm+swish ResNet conv stacks with a single
vanilla attention block at the bottleneck (ddconfig: ch=128,
ch_mult=[1,2,4,4], num_res_blocks=2, attn_resolutions=[], double_z).

API mirrors the reference (NCHW in/out, scale_factor 0.18215):
  encode_moments(x) -> (N, 8, H/8, W/8)
  sample(rng, moments) -> z * scale_factor
  encode(rng, x) -> z
  decode(z) -> (N, 3, H, W)

Internally all convs run NHWC (the TPU-native layout). Weights port from
the released ``autoencoder_kl.pth`` via maskdit_tpu.utils.port; parameter
paths deliberately mirror the torch module tree (encoder/down_0/block_1/...)
so conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6, affine) over NHWC, stats in fp32."""

    num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        n, h, w, _ = x32.shape
        g = self.num_groups
        xg = x32.reshape(n, h, w, g, c // g)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.square(xg - mean).mean(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + 1e-6)
        out = xg.reshape(n, h, w, c) * scale + bias
        return out.astype(x.dtype)


class Conv(nn.Module):
    """3x3 or 1x1 conv, NHWC, torch-compatible SAME padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = None  # default: symmetric (kernel//2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding
        if pad is None:
            p = self.kernel // 2
            pad = [(p, p), (p, p)]
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            dtype=self.dtype,
            name="conv",
        )(x)


class ResnetBlock(nn.Module):
    """norm-swish-conv x2 with learned 1x1 shortcut on channel change
    (reference: autoencoder.py:80-135, temb_channels=0 path)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv(self.out_channels, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention over spatial tokens
    (reference: autoencoder.py:148-199). Softmax in fp32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        h_ = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = Conv(c, 1, dtype=self.dtype, name="q")(h_).reshape(n, h * w, c)
        k = Conv(c, 1, dtype=self.dtype, name="k")(h_).reshape(n, h * w, c)
        v = Conv(c, 1, dtype=self.dtype, name="v")(h_).reshape(n, h * w, c)
        logits = jnp.einsum(
            "nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32
        ) * (c ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "nqk,nkc->nqc", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(n, h, w, c)
        out = Conv(c, 1, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """stride-2 conv with torch's asymmetric (0,1,0,1) padding
    (reference: autoencoder.py:57-76)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        return Conv(
            c, 3, stride=2, padding=[(0, 1), (0, 1)], dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    """2x nearest upsample + 3x3 conv (reference: autoencoder.py:38-54)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv(c, 3, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Conv(self.ch, 3, dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * mult, dtype=self.dtype, name=f"down_{i}_block_{j}"
                )(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv(out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        block_in = self.ch * self.ch_mult[-1]
        h = Conv(block_in, 3, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    self.ch * self.ch_mult[i], dtype=self.dtype,
                    name=f"up_{i}_block_{j}",
                )(h)
            if i != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        return Conv(self.out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Frozen KL autoencoder; NCHW public API (reference: :412-479)."""

    embed_dim: int = 4
    z_channels: int = 4
    scale_factor: float = 0.18215
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.encoder = Encoder(z_channels=self.z_channels, dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)
        self.quant_conv = Conv(2 * self.embed_dim, 1, dtype=self.dtype)
        self.post_quant_conv = Conv(self.z_channels, 1, dtype=self.dtype)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        h = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        h = self.encoder(h.astype(self.dtype))
        moments = self.quant_conv(h)
        return moments.transpose(0, 3, 1, 2)

    def sample_z(self, rng: jax.Array, moments: jax.Array) -> jax.Array:
        mean, logvar = jnp.split(moments, 2, axis=1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.scale_factor * z

    def encode(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        return self.sample_z(rng, self.encode_moments(x))

    def decode(self, z: jax.Array) -> jax.Array:
        z = (1.0 / self.scale_factor) * z
        h = z.transpose(0, 2, 3, 1)
        h = self.post_quant_conv(h.astype(self.dtype))
        dec = self.decoder(h)
        return dec.transpose(0, 3, 1, 2)

    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Full round trip (init convenience)."""
        return self.decode(self.encode(x, rng))
