"""Full-model parity: our EDMPrecond vs a torch oracle with shared weights.

The oracle is a from-scratch torch implementation of the masked-DiT
architecture (standard adaLN-Zero DiT pieces + the MaskDiT asymmetric
decoder, per the TMLR 2024 paper) using the reference state-dict naming.
Weights flow through utils/port.export_maskdit -> convert_maskdit, so a
pass here means the wiring (pos-embed add points, packed-token gather,
decoder mask-token scatter, conditioning sums, EDM preconditioning) is
port-exact — the strongest pre-release-checkpoint validation we can run
without network access.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from maskdit_tpu.models import create_model
from maskdit_tpu.models.layers import get_2d_sincos_pos_embed
from maskdit_tpu.utils import port

# tiny config
RES, PATCH, CIN, D, DEPTH, HEADS, K = 8, 2, 4, 32, 2, 4, 6
DEC_D, DEC_DEPTH, DEC_HEADS = 512, 8, 16  # decoder dims are fixed in the arch


class TBlock(tnn.Module):
    def __init__(self, d, c_dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.norm2 = tnn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
        self.attn = tnn.ModuleDict({
            "qkv": tnn.Linear(d, 3 * d), "proj": tnn.Linear(d, d)
        })
        self.mlp = tnn.ModuleDict({
            "fc1": tnn.Linear(d, 4 * d), "fc2": tnn.Linear(4 * d, d)
        })
        self.adaLN_modulation = tnn.Sequential(tnn.SiLU(), tnn.Linear(c_dim, 6 * d))

    def _attn(self, x):
        b, l, d = x.shape
        hd = d // self.heads
        qkv = self.attn["qkv"](x).reshape(b, l, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv
        a = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, -1)
        return self.attn["proj"]((a @ v).transpose(1, 2).reshape(b, l, d))

    def forward(self, x, c):
        sm, scm, gm, sp, scp, gp = self.adaLN_modulation(c).chunk(6, dim=1)
        mod = lambda h, s, sc: h * (1 + sc.unsqueeze(1)) + s.unsqueeze(1)
        x = x + gm.unsqueeze(1) * self._attn(mod(self.norm1(x), sm, scm))
        h = mod(self.norm2(x), sp, scp)
        h = self.mlp["fc2"](F.gelu(self.mlp["fc1"](h), approximate="tanh"))
        return x + gp.unsqueeze(1) * h


class TOracle(tnn.Module):
    """Masked DiT encoder-decoder + EDM preconditioning, reference naming."""

    def __init__(self):
        super().__init__()
        L = (RES // PATCH) ** 2
        self.x_embedder = tnn.ModuleDict(
            {"proj": tnn.Conv2d(CIN, D, PATCH, stride=PATCH)}
        )
        self.t_embedder = tnn.ModuleDict({})
        self.t_mlp0 = tnn.Linear(256, D)
        self.t_mlp2 = tnn.Linear(D, D)
        self.y_embedder = tnn.Linear(K, D, bias=False)
        self.blocks = tnn.ModuleList([TBlock(D, D, HEADS) for _ in range(DEPTH)])
        self.decoder_layer_ada = tnn.Sequential(tnn.SiLU(), tnn.Linear(D, 2 * D))
        self.decoder_layer_lin = tnn.Linear(D, DEC_D)
        self.decoder_blocks = tnn.ModuleList(
            [TBlock(DEC_D, D, DEC_HEADS) for _ in range(DEC_DEPTH)]
        )
        self.mask_token = tnn.Parameter(torch.zeros(1, 1, DEC_D))
        self.final_ada = tnn.Sequential(tnn.SiLU(), tnn.Linear(D, 2 * DEC_D))
        self.final_lin = tnn.Linear(DEC_D, PATCH * PATCH * CIN)
        self.pos = torch.from_numpy(get_2d_sincos_pos_embed(D, RES // PATCH)).float()
        self.dec_pos = torch.from_numpy(
            get_2d_sincos_pos_embed(DEC_D, RES // PATCH)
        ).float()

    def t_embed(self, t):
        half = 128
        freqs = torch.exp(
            -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t[:, None] * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], -1)
        return self.t_mlp2(F.silu(self.t_mlp0(emb)))

    def forward(self, x, sigma, y, ids_keep=None, ids_restore=None):
        sigma = sigma.reshape(-1, 1, 1, 1)
        c_skip = 0.25 / (sigma ** 2 + 0.25)
        c_out = sigma * 0.5 / (sigma ** 2 + 0.25).sqrt()
        c_in = 1 / (0.25 + sigma ** 2).sqrt()
        c_noise = (sigma.log() / 4).flatten()

        h = self.x_embedder["proj"](c_in * x).flatten(2).transpose(1, 2)
        h = h + self.pos[None]
        if ids_keep is not None:
            h = torch.gather(
                h, 1, ids_keep.unsqueeze(-1).repeat(1, 1, h.shape[2])
            )
        c = self.t_embed(c_noise) + self.y_embedder(y)
        for blk in self.blocks:
            h = blk(h, c)
        # decoder
        sh, sc = self.decoder_layer_ada(c).chunk(2, dim=1)
        h = F.layer_norm(h, (D,), eps=1e-6) * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)
        h = self.decoder_layer_lin(h)
        if ids_restore is not None:
            n_mask = ids_restore.shape[1] - h.shape[1]
            mt = self.mask_token.repeat(h.shape[0], n_mask, 1)
            h = torch.cat([h, mt], 1)
            h = torch.gather(
                h, 1, ids_restore.unsqueeze(-1).repeat(1, 1, h.shape[2])
            )
        h = h + self.dec_pos[None]
        for blk in self.decoder_blocks:
            h = blk(h, c)
        sh, sc = self.final_ada(c).chunk(2, dim=1)
        h = F.layer_norm(h, (DEC_D,), eps=1e-6) * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)
        h = self.final_lin(h)
        # unpatchify
        n, l, _ = h.shape
        g = RES // PATCH
        h = h.reshape(n, g, g, PATCH, PATCH, CIN)
        f_x = torch.einsum("nhwpqc->nchpwq", h).reshape(n, CIN, RES, RES)
        return c_skip * x + c_out * f_x

    def reference_state_dict(self):
        return {
            k: v.detach().numpy()
            for k, v in self.named_reference_tensors().items()
        }

    def named_reference_tensors(self):
        """Reference-checkpoint key -> live parameter tensor (lets
        tests/test_xl_port.py LOAD an exported state dict back into the
        oracle via copy_, exercising export_maskdit at scale)."""
        sd = {}
        sd["model.x_embedder.proj.weight"] = self.x_embedder["proj"].weight
        sd["model.x_embedder.proj.bias"] = self.x_embedder["proj"].bias
        sd["model.t_embedder.mlp.0.weight"] = self.t_mlp0.weight
        sd["model.t_embedder.mlp.0.bias"] = self.t_mlp0.bias
        sd["model.t_embedder.mlp.2.weight"] = self.t_mlp2.weight
        sd["model.t_embedder.mlp.2.bias"] = self.t_mlp2.bias
        sd["model.y_embedder.embedding_table.weight"] = self.y_embedder.weight
        for name, blocks in (("blocks", self.blocks),
                             ("decoder_blocks", self.decoder_blocks)):
            for i, blk in enumerate(blocks):
                p = f"model.{name}.{i}"
                sd[f"{p}.attn.qkv.weight"] = blk.attn["qkv"].weight
                sd[f"{p}.attn.qkv.bias"] = blk.attn["qkv"].bias
                sd[f"{p}.attn.proj.weight"] = blk.attn["proj"].weight
                sd[f"{p}.attn.proj.bias"] = blk.attn["proj"].bias
                sd[f"{p}.mlp.fc1.weight"] = blk.mlp["fc1"].weight
                sd[f"{p}.mlp.fc1.bias"] = blk.mlp["fc1"].bias
                sd[f"{p}.mlp.fc2.weight"] = blk.mlp["fc2"].weight
                sd[f"{p}.mlp.fc2.bias"] = blk.mlp["fc2"].bias
                sd[f"{p}.adaLN_modulation.1.weight"] = blk.adaLN_modulation[1].weight
                sd[f"{p}.adaLN_modulation.1.bias"] = blk.adaLN_modulation[1].bias
        sd["model.decoder_layer.adaLN_modulation.1.weight"] = self.decoder_layer_ada[1].weight
        sd["model.decoder_layer.adaLN_modulation.1.bias"] = self.decoder_layer_ada[1].bias
        sd["model.decoder_layer.linear.weight"] = self.decoder_layer_lin.weight
        sd["model.decoder_layer.linear.bias"] = self.decoder_layer_lin.bias
        sd["model.final_layer.adaLN_modulation.1.weight"] = self.final_ada[1].weight
        sd["model.final_layer.adaLN_modulation.1.bias"] = self.final_ada[1].bias
        sd["model.final_layer.linear.weight"] = self.final_lin.weight
        sd["model.final_layer.linear.bias"] = self.final_lin.bias
        sd["model.mask_token"] = self.mask_token
        return sd


@pytest.fixture(scope="module")
def shared():
    torch.manual_seed(0)
    oracle = TOracle().eval()
    for p in oracle.parameters():
        tnn.init.normal_(p, std=0.08)
    params = jax.tree.map(
        jnp.asarray, port.convert_maskdit(oracle.reference_state_dict())
    )
    return oracle, params


def _our_model():
    from maskdit_tpu.models.dit import DIT_CONFIGS

    DIT_CONFIGS.setdefault(
        "DiT-TEST/2",
        dict(depth=DEPTH, hidden_size=D, patch_size=PATCH, num_heads=HEADS),
    )
    return create_model(
        "edm", img_resolution=RES, img_channels=CIN, num_classes=K,
        model_type="DiT-TEST/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )


def test_full_model_matches_torch_oracle_unmasked(shared):
    oracle, params = shared
    model = _our_model()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, CIN, RES, RES)).astype(np.float32)
    sigma = np.array([0.4, 2.7], dtype=np.float32)
    y = np.eye(K, dtype=np.float32)[[1, 4]]

    ours = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(y)
    )["x"]
    with torch.no_grad():
        theirs = oracle(
            torch.from_numpy(x), torch.from_numpy(sigma), torch.from_numpy(y)
        )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-5)


def test_full_model_matches_torch_oracle_masked(shared):
    """Masked training forward with an externally fixed mask."""
    from maskdit_tpu.models import masking

    oracle, params = shared
    model = _our_model()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, CIN, RES, RES)).astype(np.float32)
    sigma = np.array([1.1, 0.6], dtype=np.float32)
    y = np.eye(K, dtype=np.float32)[[0, 5]]

    info = masking.random_mask(jax.random.PRNGKey(9), 2, 16, 0.5)
    ours = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(y),
        mask_ratio=0.5, mask_info=info, train=True,
    )["x"]
    with torch.no_grad():
        theirs = oracle(
            torch.from_numpy(x), torch.from_numpy(sigma), torch.from_numpy(y),
            ids_keep=torch.from_numpy(np.asarray(info.ids_keep)).long(),
            ids_restore=torch.from_numpy(np.asarray(info.ids_restore)).long(),
        )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-5)
