"""Checkpoint-converter tests: reference-format state dicts -> our params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskdit_tpu.models import create_model
from maskdit_tpu.utils import port
from maskdit_tpu.utils.ckpt import graft_params


def _reference_style_state(params: dict) -> dict:
    """Reference torch key naming via the production export converter."""
    return port.export_maskdit(params)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=6,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    x = jnp.zeros((1, 4, 8, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, jnp.ones((1,)), jnp.zeros((1, 6)),
    )
    # randomize so zero-init layers round-trip meaningfully
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(p.size % 97), p.shape) * 0.05,
        variables["params"],
    )
    return model, params


def test_maskdit_converter_roundtrip(tiny_model_and_params):
    model, params = tiny_model_and_params
    state = _reference_style_state(jax.tree.map(np.asarray, params))
    recovered = port.convert_maskdit(state)

    # trees must match leaf-for-leaf
    orig = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    rec = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(recovered)
    }
    assert set(orig) == set(rec)
    for key in orig:
        np.testing.assert_allclose(
            np.asarray(orig[key]), rec[key], atol=1e-6, err_msg=key
        )

    # converted params drive the model to the same outputs
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    sigma = jnp.array([0.7, 1.3])
    y = jax.nn.one_hot(jnp.array([1, 2]), 6)
    out_a = model.apply({"params": params}, x, sigma, y)
    out_b = model.apply(
        {"params": jax.tree.map(jnp.asarray, recovered)}, x, sigma, y
    )
    np.testing.assert_allclose(
        np.asarray(out_a["x"]), np.asarray(out_b["x"]), atol=1e-5
    )


def test_maskdit_converter_rejects_unknown():
    with pytest.raises(KeyError):
        port.convert_maskdit({"model.blocks.0.attn.bogus.weight": np.zeros((4, 4))})


def test_load_reference_pt_checkpoint(tiny_model_and_params, tmp_path):
    """Full .pt import path: torch.save({'ema','model'}) -> converted tree."""
    import torch

    from maskdit_tpu.utils.ckpt import load_reference_checkpoint

    model, params = tiny_model_and_params
    state = _reference_style_state(jax.tree.map(np.asarray, params))
    tstate = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    path = str(tmp_path / "0001000.pt")
    torch.save({"ema": tstate, "model": tstate, "args": {"note": "test"}}, path)

    loaded = load_reference_checkpoint(path, use_ema=True)
    ref = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    got = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(loaded)
    }
    assert set(ref) == set(got)
    for key in ref:
        np.testing.assert_allclose(np.asarray(ref[key]), got[key], atol=1e-6)

    # non-strict load drops unknown keys instead of failing
    tstate2 = dict(tstate)
    tstate2["model.some_new_thing.weight"] = torch.zeros(3, 3)
    path2 = str(tmp_path / "0002000.pt")
    torch.save({"ema": tstate2, "model": tstate2}, path2)
    with pytest.raises(KeyError):
        load_reference_checkpoint(path2, use_ema=True, strict=True)
    loaded2 = load_reference_checkpoint(path2, use_ema=True, strict=False)
    assert "some_new_thing" not in loaded2.get("model", {})


def test_graft_params_nonstrict(tiny_model_and_params):
    """Partial checkpoints overlay; missing keys keep init values
    (reference --use_strict_load False, train.py:150-151)."""
    _, params = tiny_model_and_params
    target = jax.tree.map(np.asarray, params)
    partial = {"model": {"mask_token": np.full_like(target["model"]["mask_token"], 9.0)}}
    out = graft_params(target, partial)
    np.testing.assert_allclose(out["model"]["mask_token"], 9.0)
    np.testing.assert_allclose(
        out["model"]["final_layer"]["linear"]["bias"],
        target["model"]["final_layer"]["linear"]["bias"],
    )
    bad = {"model": {"mask_token": np.zeros((2, 2))}}
    with pytest.raises(ValueError):
        graft_params(target, bad)
