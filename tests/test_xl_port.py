"""XL/2-scale offline port hardening (VERDICT r3 next #6).

The standard oracle tests (test_model_oracle.py, test_vae.py) run at tiny
dims, which cannot catch scale-dependent port quirks: the hd=72 head
slicing, depth-28 scan stacking, the 1152->512 decoder width change, or
256px VAE tensor layouts. These tests run the SAME torch oracles at the
real XL/2 / SD-VAE dimensions through the full converter path
(export_maskdit -> torch load -> forward vs convert_maskdit ->
stack_scan_blocks -> apply) and record a max|delta| bound — the best
FID-gate proxy available in a zero-egress environment (the real gate,
scripts/fid_parity_gate.sh, needs released weights).

Opt-in: MASKDIT_XL_ORACLE=1 (multi-minute, multi-GB runs). The measured
bounds are recorded in STATUS.md ("XL-scale port hardening").

Reference spec: /root/reference/models/maskdit.py:237-587 (MaskDiT XL/2),
/root/reference/autoencoder.py:412-479 (SD AutoencoderKL).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import test_model_oracle as mo
import test_vae as mv
from maskdit_tpu.models import create_model, masking
from maskdit_tpu.models import vae as jvae
from maskdit_tpu.utils import port

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("MASKDIT_XL_ORACLE") != "1",
        reason="XL-scale oracle is opt-in: set MASKDIT_XL_ORACLE=1",
    ),
]

# DiT-XL/2 (dit.py DIT_CONFIGS): depth 28, hidden 1152, heads 16 -> hd=72
XL = dict(PATCH=2, CIN=4, D=1152, DEPTH=28, HEADS=16, K=1000)


def _patch_oracle_dims(monkeypatch, res: int) -> None:
    for name, val in dict(XL, RES=res).items():
        monkeypatch.setattr(mo, name, val)


def _random_xl_params(res: int):
    """Random fp32 params with our XL/2 tree structure, std 0.02.

    The model's own init zeroes the adaLN/final kernels, which would make
    the oracle comparison trivially pass on the decoder half — random
    weights at trained-like scale exercise every matmul path.
    """
    model = create_model(
        "edm", img_resolution=res, img_channels=XL["CIN"],
        num_classes=XL["K"], model_type="DiT-XL/2", use_decoder=True,
        mae_loss_coef=0.1, dtype=jnp.float32, use_flash=False,
    )
    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r}, jnp.zeros((1, XL["CIN"], res, res)),
            jnp.ones((1,)), jnp.zeros((1, XL["K"])),
        ),
        jax.random.PRNGKey(0),
    )["params"]
    rng = np.random.RandomState(0)
    leaves, treedef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(
        treedef,
        [np.asarray(rng.standard_normal(l.shape) * 0.02, np.float32)
         for l in leaves],
    )
    return model, params


def _load_oracle(params) -> "mo.TOracle":
    """export_maskdit -> torch oracle (the checkpoint-export direction)."""
    import torch

    state = port.export_maskdit(params)
    oracle = mo.TOracle().eval()
    named = oracle.named_reference_tensors()
    assert set(named) == set(state), (
        sorted(set(named) ^ set(state))
    )
    with torch.no_grad():
        for k, t in named.items():
            t.copy_(torch.from_numpy(np.ascontiguousarray(state[k])))
    return oracle


def _scan_model(res: int):
    return create_model(
        "edm", img_resolution=res, img_channels=XL["CIN"],
        num_classes=XL["K"], model_type="DiT-XL/2", use_decoder=True,
        mae_loss_coef=0.1, dtype=jnp.float32, use_flash=False,
        scan_blocks=True,
    )


def _compare(ours, theirs, tag: str, rel_bound: float) -> None:
    ours, theirs = np.asarray(ours), np.asarray(theirs)
    scale = float(np.abs(theirs).max())
    delta = float(np.abs(ours - theirs).max())
    print(f"[xl-port] {tag}: max|delta|={delta:.3e} scale={scale:.3e} "
          f"rel={delta / scale:.3e}")
    assert delta <= rel_bound * scale, (tag, delta, scale)


def test_xl2_256res_masked_port(monkeypatch):
    """Full XL/2 at 256-res training shapes: L=256, mask 0.5 (keep 128),
    through export (torch side) and convert+scan-stack (our side)."""
    import torch

    res = 32  # latent resolution for 256px
    _patch_oracle_dims(monkeypatch, res)
    _, params = _random_xl_params(res)
    oracle = _load_oracle(params)

    # converter round-trip at scale: convert(export(p)) == p exactly
    recovered = port.convert_maskdit(port.export_maskdit(params))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(recovered),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    model = _scan_model(res)
    scan_params = port.stack_scan_blocks(jax.device_get(params))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, XL["CIN"], res, res)).astype(np.float32)
    sigma = np.array([0.4, 2.7], dtype=np.float32)
    y = np.eye(XL["K"], dtype=np.float32)[[7, 123]]
    L = (res // XL["PATCH"]) ** 2
    info = masking.random_mask(jax.random.PRNGKey(9), 2, L, 0.5)

    ours = jax.jit(
        lambda p, x, s, y: model.apply(
            {"params": p}, x, s, y, mask_ratio=0.5, mask_info=info,
            train=True,
        )["x"]
    )(scan_params, jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(y))
    with torch.no_grad():
        theirs = oracle(
            torch.from_numpy(x), torch.from_numpy(sigma), torch.from_numpy(y),
            ids_keep=torch.from_numpy(np.asarray(info.ids_keep)).long(),
            ids_restore=torch.from_numpy(np.asarray(info.ids_restore)).long(),
        )
    _compare(ours, theirs.numpy(), "xl2-256res-masked", 5e-4)


def test_xl2_512res_unmasked_port(monkeypatch):
    """XL/2 at the 512-res finetune/inference shape: L=1024 unmasked."""
    import torch

    res = 64
    _patch_oracle_dims(monkeypatch, res)
    _, params = _random_xl_params(res)
    oracle = _load_oracle(params)
    model = _scan_model(res)
    scan_params = port.stack_scan_blocks(jax.device_get(params))

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, XL["CIN"], res, res)).astype(np.float32)
    sigma = np.array([1.1], dtype=np.float32)
    y = np.eye(XL["K"], dtype=np.float32)[[500]]

    ours = jax.jit(
        lambda p, x, s, y: model.apply({"params": p}, x, s, y)["x"]
    )(scan_params, jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(y))
    with torch.no_grad():
        theirs = oracle(
            torch.from_numpy(x), torch.from_numpy(sigma), torch.from_numpy(y)
        )
    _compare(ours, theirs.numpy(), "xl2-512res-unmasked", 5e-4)


def test_sd_vae_256px_port(monkeypatch):
    """Full SD-VAE config (ch 128, mult 1/2/4/4, 2 res blocks) at 256px:
    encode moments + decode through convert_vae, vs the torch oracle."""
    import torch

    for name, val in dict(CH=128, CH_MULT=(1, 2, 4, 4), NRB=2, ZCH=4).items():
        monkeypatch.setattr(mv, name, val)
    torch.manual_seed(0)
    tmodel = mv.TVAE().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            torch.nn.init.normal_(p, std=0.02)
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = port.convert_vae(state)
    model = jvae.AutoencoderKL()  # default = full SD config

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        t_moments = tmodel.quant_conv(tmodel.encoder(torch.from_numpy(x)))
    j_moments = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="encode_moments")
    )(jparams, jnp.asarray(x))
    _compare(j_moments, t_moments.numpy(), "vae-256px-encode", 1e-3)

    z = rng.normal(size=(1, 4, 32, 32)).astype(np.float32) * 0.18215
    with torch.no_grad():
        t_dec = tmodel.decoder(tmodel.post_quant_conv(torch.from_numpy(z / 0.18215)))
    j_dec = jax.jit(
        lambda p, z: model.apply({"params": p}, z, method="decode")
    )(jparams, jnp.asarray(z))
    _compare(j_dec, t_dec.numpy(), "vae-256px-decode", 1e-3)
