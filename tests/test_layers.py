"""Layer-level golden tests, with torch (CPU) as an independent numeric oracle.

The torch oracles below are written from the published DiT/adaLN math — they
exercise the exact packing/ordering conventions (qkv interleave, adaLN chunk
order, patch-kernel layout) that the torch->jax weight converter depends on.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from maskdit_tpu.models import layers


# ---------------------------------------------------------------------------
# positional / timestep embeddings
# ---------------------------------------------------------------------------

def test_sincos_pos_embed_analytic():
    """Check table values against the closed-form sin/cos definition."""
    dim, gs = 16, 4
    tab = layers.get_2d_sincos_pos_embed(dim, gs)
    assert tab.shape == (gs * gs, dim)

    # token (i, j) -> first half encodes the w coordinate (reference grid[0]
    # is the w mesh), second half the h coordinate; each half is [sin | cos].
    quarter = dim // 4
    omega = 1.0 / 10000 ** (np.arange(quarter, dtype=np.float64) / quarter)
    for i in range(gs):
        for j in range(gs):
            row = tab[i * gs + j]
            np.testing.assert_allclose(row[:quarter], np.sin(j * omega), atol=1e-6)
            np.testing.assert_allclose(
                row[quarter : 2 * quarter], np.cos(j * omega), atol=1e-6
            )
            np.testing.assert_allclose(
                row[2 * quarter : 3 * quarter], np.sin(i * omega), atol=1e-6
            )
            np.testing.assert_allclose(row[3 * quarter :], np.cos(i * omega), atol=1e-6)


def test_sincos_pos_embed_extra_tokens():
    tab = layers.get_2d_sincos_pos_embed(8, 2, cls_token=True, extra_tokens=1)
    assert tab.shape == (5, 8)
    np.testing.assert_array_equal(tab[0], 0.0)


def test_timestep_embedding_formula():
    dim = 8
    t = jnp.array([0.0, 1.0, 2.5])
    emb = np.asarray(layers.timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    for i, tv in enumerate([0.0, 1.0, 2.5]):
        np.testing.assert_allclose(emb[i, :half], np.cos(tv * freqs), atol=1e-6)
        np.testing.assert_allclose(emb[i, half:], np.sin(tv * freqs), atol=1e-6)


# ---------------------------------------------------------------------------
# layer norm / modulate vs torch
# ---------------------------------------------------------------------------

def test_layer_norm_matches_torch():
    x = np.random.default_rng(0).normal(size=(2, 5, 16)).astype(np.float32)
    ours = np.asarray(layers.layer_norm_no_affine(jnp.asarray(x)))
    theirs = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,), eps=1e-6)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_gelu_tanh_matches_torch():
    x = np.linspace(-4, 4, 64, dtype=np.float32)
    ours = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=True))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh")
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# DiTBlock vs a torch oracle with shared weights
# ---------------------------------------------------------------------------

class TorchDiTBlock(torch.nn.Module):
    """Standard adaLN-Zero DiT block (public DiT math), used as test oracle."""

    def __init__(self, d, c_dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.heads = heads
        self.norm1 = torch.nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.qkv = torch.nn.Linear(d, 3 * d, bias=True)
        self.proj = torch.nn.Linear(d, d, bias=True)
        self.fc1 = torch.nn.Linear(d, int(d * mlp_ratio))
        self.fc2 = torch.nn.Linear(int(d * mlp_ratio), d)
        self.ada = torch.nn.Linear(c_dim, 6 * d, bias=True)

    def attn(self, x):
        b, l, d = x.shape
        hd = d // self.heads
        qkv = self.qkv(x).reshape(b, l, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(b, l, d))

    def forward(self, x, c):
        mod = self.ada(torch.nn.functional.silu(c))
        sm, scm, gm, sp, scp, gp = mod.chunk(6, dim=1)

        def modulate(h, shift, scale):
            return h * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)

        x = x + gm.unsqueeze(1) * self.attn(modulate(self.norm1(x), sm, scm))
        h = modulate(self.norm2(x), sp, scp)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h), approximate="tanh"))
        return x + gp.unsqueeze(1) * h


@pytest.mark.parametrize("d,heads", [(32, 4), (48, 6)])
def test_dit_block_matches_torch_oracle(d, heads):
    torch.manual_seed(0)
    c_dim = d
    oracle = TorchDiTBlock(d, c_dim, heads)
    # random (non-zero) weights everywhere, incl. the adaLN projection
    for p in oracle.parameters():
        torch.nn.init.normal_(p, std=0.1)

    block = layers.DiTBlock(d, c_dim, heads, dtype=jnp.float32, use_flash=False)
    params = {
        "attn": {
            "qkv": {
                "kernel": jnp.asarray(oracle.qkv.weight.detach().numpy().T),
                "bias": jnp.asarray(oracle.qkv.bias.detach().numpy()),
            },
            "proj": {
                "kernel": jnp.asarray(oracle.proj.weight.detach().numpy().T),
                "bias": jnp.asarray(oracle.proj.bias.detach().numpy()),
            },
        },
        "mlp": {
            "fc1": {
                "kernel": jnp.asarray(oracle.fc1.weight.detach().numpy().T),
                "bias": jnp.asarray(oracle.fc1.bias.detach().numpy()),
            },
            "fc2": {
                "kernel": jnp.asarray(oracle.fc2.weight.detach().numpy().T),
                "bias": jnp.asarray(oracle.fc2.bias.detach().numpy()),
            },
        },
        "adaLN_modulation": {
            "kernel": jnp.asarray(oracle.ada.weight.detach().numpy().T),
            "bias": jnp.asarray(oracle.ada.bias.detach().numpy()),
        },
    }

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 10, d)).astype(np.float32)
    c = rng.normal(size=(2, c_dim)).astype(np.float32)

    ours = block.apply({"params": params}, jnp.asarray(x), jnp.asarray(c))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x), torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def test_patch_embed_matches_torch_conv():
    """PatchEmbed matmul == torch strided conv with permuted kernel."""
    torch.manual_seed(2)
    p, cin, d = 2, 4, 12
    conv = torch.nn.Conv2d(cin, d, kernel_size=p, stride=p)
    x = torch.randn(3, cin, 8, 8)
    with torch.no_grad():
        theirs = conv(x).flatten(2).transpose(1, 2).numpy()  # (N, L, D)

    pe = layers.PatchEmbed(p, d, dtype=jnp.float32)
    params = {
        "kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        ),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    ours = pe.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
