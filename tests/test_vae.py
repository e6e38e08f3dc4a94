"""VAE parity vs a torch oracle sharing weights through the converter.

The torch oracle below implements the standard SD AutoencoderKL building
blocks (GroupNorm-swish ResNet + mid attention) with the reference's
state-dict key layout, so this test exercises models/vae.py AND
utils/port.convert_vae end to end: torch state_dict -> convert -> flax
apply must reproduce torch outputs.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from maskdit_tpu.models import vae as jvae
from maskdit_tpu.utils import port

CH = 32
CH_MULT = (1, 2)
NRB = 1
ZCH = 2


def gn(c):
    return tnn.GroupNorm(32, c, eps=1e-6, affine=True)


def swish(x):
    return x * torch.sigmoid(x)


class TRes(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1, self.conv1 = gn(cin), tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2, self.conv2 = gn(cout), tnn.Conv2d(cout, cout, 3, padding=1)
        self.nin_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(swish(self.norm1(x)))
        h = self.conv2(swish(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class TAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = gn(c)
        self.q, self.k, self.v = (tnn.Conv2d(c, c, 1) for _ in range(3))
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        h_ = self.norm(x)
        q = self.q(h_).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(h_).reshape(b, c, h * w)
        v = self.v(h_).reshape(b, c, h * w)
        attn = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        out = torch.bmm(v, attn.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class TEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, CH, 3, padding=1)
        self.down = tnn.ModuleList()
        cin = CH
        for i, m in enumerate(CH_MULT):
            level = tnn.Module()
            level.block = tnn.ModuleList()
            for _ in range(NRB):
                level.block.append(TRes(cin, CH * m))
                cin = CH * m
            if i != len(CH_MULT) - 1:
                level.downsample = tnn.Module()
                level.downsample.conv = tnn.Conv2d(cin, cin, 3, stride=2, padding=0)
            self.down.append(level)
        self.mid = tnn.Module()
        self.mid.block_1 = TRes(cin, cin)
        self.mid.attn_1 = TAttn(cin)
        self.mid.block_2 = TRes(cin, cin)
        self.norm_out = gn(cin)
        self.conv_out = tnn.Conv2d(cin, 2 * ZCH, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for i, level in enumerate(self.down):
            for blk in level.block:
                h = blk(h)
            if hasattr(level, "downsample"):
                h = torch.nn.functional.pad(h, (0, 1, 0, 1))
                h = level.downsample.conv(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(swish(self.norm_out(h)))


class TDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        cin = CH * CH_MULT[-1]
        self.conv_in = tnn.Conv2d(ZCH, cin, 3, padding=1)
        self.mid = tnn.Module()
        self.mid.block_1 = TRes(cin, cin)
        self.mid.attn_1 = TAttn(cin)
        self.mid.block_2 = TRes(cin, cin)
        self.up = tnn.ModuleList([tnn.Module() for _ in CH_MULT])
        for i in reversed(range(len(CH_MULT))):
            level = self.up[i]
            level.block = tnn.ModuleList()
            for _ in range(NRB + 1):
                level.block.append(TRes(cin, CH * CH_MULT[i]))
                cin = CH * CH_MULT[i]
            if i != 0:
                level.upsample = tnn.Module()
                level.upsample.conv = tnn.Conv2d(cin, cin, 3, padding=1)
        self.norm_out = gn(cin)
        self.conv_out = tnn.Conv2d(cin, 3, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(len(CH_MULT))):
            for blk in self.up[i].block:
                h = blk(h)
            if i != 0:
                h = torch.nn.functional.interpolate(h, scale_factor=2.0, mode="nearest")
                h = self.up[i].upsample.conv(h)
        return self.conv_out(swish(self.norm_out(h)))


class TVAE(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder()
        self.quant_conv = tnn.Conv2d(2 * ZCH, 2 * ZCH, 1)
        self.post_quant_conv = tnn.Conv2d(ZCH, ZCH, 1)


@pytest.fixture(scope="module")
def shared():
    torch.manual_seed(0)
    tmodel = TVAE()
    for p in tmodel.parameters():
        tnn.init.normal_(p, std=0.08)
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = port.convert_vae(state)
    return tmodel, jparams


def _tiny_jax_vae():
    class TinyVAE(jvae.AutoencoderKL):
        def setup(self):
            self.encoder = jvae.Encoder(
                ch=CH, ch_mult=CH_MULT, num_res_blocks=NRB, z_channels=ZCH
            )
            self.decoder = jvae.Decoder(
                ch=CH, ch_mult=CH_MULT, num_res_blocks=NRB, out_ch=3
            )
            self.quant_conv = jvae.Conv(2 * ZCH, 1)
            self.post_quant_conv = jvae.Conv(ZCH, 1)

    return TinyVAE(embed_dim=ZCH, z_channels=ZCH)


def test_vae_encode_decode_matches_torch(shared):
    tmodel, jparams = shared
    model = _tiny_jax_vae()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)

    with torch.no_grad():
        t_moments = tmodel.quant_conv(tmodel.encoder(torch.from_numpy(x))).numpy()
    j_moments = model.apply(
        {"params": jparams}, jnp.asarray(x), method="encode_moments"
    )
    np.testing.assert_allclose(np.asarray(j_moments), t_moments, atol=2e-4)

    z = rng.normal(size=(2, ZCH, 8, 8)).astype(np.float32) * 0.18215
    with torch.no_grad():
        t_dec = tmodel.decoder(
            tmodel.post_quant_conv(torch.from_numpy(z / 0.18215))
        ).numpy()
    j_dec = model.apply({"params": jparams}, jnp.asarray(z), method="decode")
    np.testing.assert_allclose(np.asarray(j_dec), t_dec, atol=2e-4)


def test_vae_sample_moments_reparam(shared):
    _, jparams = shared
    model = _tiny_jax_vae()
    moments = jnp.concatenate(
        [jnp.ones((1, ZCH, 4, 4)), jnp.full((1, ZCH, 4, 4), -40.0)], axis=1
    )  # logvar clipped at -30 => std ~ 3e-7: z ~= mean * scale
    z = model.apply(
        {"params": jparams}, jax.random.PRNGKey(0), moments, method="sample_z"
    )
    np.testing.assert_allclose(np.asarray(z), 0.18215, atol=1e-3)


def test_export_vae_roundtrip():
    """export_vae(convert_vae(sd)) == sd for a full-config VAE tree."""
    import jax

    model = jvae.AutoencoderKL()
    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 3, 32, 32)), jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0),
    )["params"]
    params = jax.tree.map(
        lambda s: np.random.default_rng(s.shape[-1]).normal(
            size=s.shape
        ).astype(np.float32),
        shapes,
    )
    state = port.export_vae(params)
    recovered = port.convert_vae(state)
    flat_a = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    flat_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(recovered)
    }
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], err_msg=k)
