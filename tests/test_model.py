"""Model-level tests: shapes, masking semantics, CFG, parameter counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskdit_tpu.models import create_dit, create_model
from maskdit_tpu.models.dit import MaskDiT


def tiny_model(**kw):
    defaults = dict(
        input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
        num_heads=4, num_classes=10, use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    defaults.update(kw)
    return MaskDiT(**defaults)


def init_vars(model, batch=2, mask_ratio=0.0, train=False):
    x = jnp.zeros((batch, model.in_channels, model.input_size, model.input_size))
    t = jnp.zeros((batch,))
    y = jnp.zeros((batch, model.num_classes)) if model.num_classes else None
    return model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, t, y, mask_ratio=mask_ratio, train=train,
    )


def test_forward_shapes_unmasked():
    model = tiny_model()
    variables = init_vars(model)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    t = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out = model.apply(variables, x, t, y, train=False)
    assert out["x"].shape == (2, 4, 8, 8)
    assert "mask" not in out


def test_forward_masked_train():
    model = tiny_model()
    variables = init_vars(model, mask_ratio=0.5, train=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    t = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out = model.apply(
        variables, x, t, y, mask_ratio=0.5, train=True,
        rngs={"mask": jax.random.PRNGKey(3)},
    )
    assert out["x"].shape == (2, 4, 8, 8)
    assert out["mask"].shape == (2, 16)  # 16 patches at 8/2
    np.testing.assert_array_equal(np.asarray(out["mask"].sum(axis=1)), [8, 8])


def test_mask_ignored_at_eval():
    """At inference masking is skipped even if a ratio is passed
    (reference: maskdit.py:479-483)."""
    model = tiny_model()
    variables = init_vars(model)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    t = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out_plain = model.apply(variables, x, t, y, train=False)
    out_masked = model.apply(
        variables, x, t, y, mask_ratio=0.5, train=False,
        rngs={"mask": jax.random.PRNGKey(3)},
    )
    np.testing.assert_allclose(
        np.asarray(out_plain["x"]), np.asarray(out_masked["x"]), atol=1e-6
    )


def test_zero_init_gives_zero_raw_output():
    """final_layer is zero-init, so raw DiT output starts at exactly 0."""
    model = tiny_model()
    variables = init_vars(model)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    out = model.apply(variables, x, jnp.ones((2,)), jnp.zeros((2, 10)))
    np.testing.assert_array_equal(np.asarray(out["x"]), 0.0)


def test_cfg_combines_halves():
    model = tiny_model()
    variables = init_vars(model)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    t = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out = model.apply(variables, x, t, y, 1.5, method=MaskDiT.forward_with_cfg)
    assert out["x"].shape == (2, 4, 8, 8)
    # cfg_scale == 1 must equal the conditional output
    out1 = model.apply(variables, x, t, y, 1.0, method=MaskDiT.forward_with_cfg)
    ref = model.apply(variables, x, t, y, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["x"]), np.asarray(ref["x"]), atol=1e-5
    )


def test_edm_precond_math():
    """D_x == c_skip*x + c_out*F_x with the EDM coefficient algebra."""
    from maskdit_tpu.models.precond import EDMPrecond

    model = EDMPrecond(
        img_resolution=8, img_channels=4, num_classes=10, model_type="DiT-S/2",
        use_decoder=True, mae_loss_coef=0.1, dtype=jnp.float32, use_flash=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    sigma = jnp.array([0.5, 2.0])
    y = jax.nn.one_hot(jnp.array([3, 4]), 10)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
        x, sigma, y,
    )
    out = model.apply(variables, x, sigma, y)
    assert out["x"].shape == x.shape
    # with zero-init final layer, F_x == 0 => D_x == c_skip * x exactly
    sig = np.asarray(sigma).reshape(-1, 1, 1, 1)
    c_skip = 0.25 / (sig ** 2 + 0.25)
    np.testing.assert_allclose(
        np.asarray(out["x"]), c_skip * np.asarray(x), atol=1e-5
    )


def test_precond_null_labels_default():
    """class_labels=None with a conditional model uses zero label rows."""
    from maskdit_tpu.models.precond import EDMPrecond

    model = EDMPrecond(
        img_resolution=8, img_channels=4, num_classes=10, model_type="DiT-S/2",
        use_decoder=True, dtype=jnp.float32, use_flash=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    sigma = jnp.array([1.0, 1.0])
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, sigma, None)
    out_none = model.apply(variables, x, sigma, None)
    out_zero = model.apply(variables, x, sigma, jnp.zeros((2, 10)))
    np.testing.assert_allclose(
        np.asarray(out_none["x"]), np.asarray(out_zero["x"]), atol=1e-6
    )


def test_registry_sizes():
    m = create_dit("DiT-XL/2")
    assert (m.depth, m.hidden_size, m.patch_size, m.num_heads) == (28, 1152, 2, 16)
    with pytest.raises(KeyError):
        create_dit("DiT-Z/1")


def test_xl2_param_count():
    """MaskDiT-XL/2 w/ decoder parameter count matches the reference scale.

    The reference reports ~730M parameters for the masked XL/2 with decoder
    (675M DiT-XL/2 encoder + 512-wide 8-block decoder); we assert the exact
    count is stable so converter regressions get caught.
    """
    model = create_model(
        "edm", img_resolution=32, img_channels=4, num_classes=1000,
        model_type="DiT-XL/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 4, 32, 32))
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            x, jnp.ones((1,)), jnp.zeros((1, 1000)),
        )
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    # encoder-only DiT-XL/2 is ~675M; decoder adds ~57M
    assert 650_000_000 < n_params < 760_000_000, n_params


def test_self_conditioning_path():
    """use_encoder_feat: eval forward runs encode() then conditions on it
    (reference: maskdit.py:518-519, 454-457)."""
    model = tiny_model(use_encoder_feat=True)
    variables = init_vars(model)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 8, 8))
    t = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([0, 1]), 10)
    out = model.apply(variables, x, t, y, train=False)
    assert out["x"].shape == (2, 4, 8, 8)


def test_pad_cls_token_path():
    model = tiny_model(pad_cls_token=True)
    variables = init_vars(model, mask_ratio=0.5, train=True)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 8, 8))
    out = model.apply(
        variables, x, jnp.ones((2,)), jax.nn.one_hot(jnp.array([1, 2]), 10),
        mask_ratio=0.5, train=True, rngs={"mask": jax.random.PRNGKey(7)},
    )
    assert out["x"].shape == (2, 4, 8, 8)
    assert out["mask"].shape == (2, 16)


def test_real_dims_s2_smoke():
    """One forward at TRUE DiT-S/2 registry dims (ADVICE r4).

    Most model/train/sharding tests run under the tiny_dit fixture, which
    rebinds 'DiT-S/2' to depth-2/hidden-64 — so real-dimension constraints
    (head-dim divisibility at 384/6, the fixed 8x512x16 decoder projection,
    non-toy param trees) would otherwise be exercised ONLY by the opt-in
    slow oracles. This runs masked-train and eval forwards at the real
    dims (eager, small input: ~17 s on 1-core CPU) so a registry- or
    decoder-dimension regression fails in the default suite.
    """
    model = create_dit(
        "DiT-S/2", input_size=8, in_channels=4, num_classes=10,
        use_decoder=True, mae_loss_coef=0.1, dtype=jnp.float32,
        use_flash=False,
    )
    assert (model.depth, model.hidden_size, model.num_heads) == (12, 384, 6)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    t = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([1, 2]), 10)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, t, y, mask_ratio=0.5, train=True,
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    assert 40_000_000 < n_params < 80_000_000, n_params  # real S/2+decoder
    out = model.apply(
        variables, x, t, y, mask_ratio=0.5, train=True,
        rngs={"mask": jax.random.PRNGKey(3)},
    )
    assert out["x"].shape == (2, 4, 8, 8)
    assert np.all(np.isfinite(np.asarray(out["x"], dtype=np.float32)))
    out_eval = model.apply(variables, x, t, y, train=False)
    assert out_eval["x"].shape == (2, 4, 8, 8)


@pytest.mark.parametrize("name", ["DiT-B/4", "DiT-L/8", "DiT-H/8"])
def test_registry_variants_forward(tiny_dit, name):
    """Every registry family builds and runs (patch sizes 4/8 shrink L)."""
    model = create_dit(
        name, input_size=16, in_channels=4, num_classes=5,
        use_decoder=True, mae_loss_coef=0.1, dtype=jnp.float32,
        use_flash=False, depth=2,  # truncate depth: wiring test, not scale
    )
    x = jnp.zeros((1, 4, 16, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, jnp.ones((1,)), jnp.zeros((1, 5)),
    )
    out = model.apply(variables, x, jnp.ones((1,)), jnp.zeros((1, 5)))
    assert out["x"].shape == (1, 4, 16, 16)


@pytest.mark.parametrize("policy", ["names", "names_lite"])
def test_remat_names_matches_no_remat(tiny_dit, policy):
    """Named-checkpoint remat must be numerically identical to no remat."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskdit_tpu.models import create_model

    kw = dict(
        img_resolution=8, img_channels=4, num_classes=10,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32,
    )
    base = create_model("edm", **kw)
    remat = create_model("edm", remat=policy, **kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 4, 8, 8))
    sigma = jnp.ones((2,))
    y = jax.nn.one_hot(jnp.array([3, 4]), 10)
    variables = base.init(
        {"params": rng, "mask": rng}, x, sigma, y, mask_ratio=0.5, train=True
    )

    def loss(model, params):
        out = model.apply(
            {"params": params}, x, sigma, y, mask_ratio=0.5, train=True,
            rngs={"mask": jax.random.fold_in(rng, 2)},
        )
        return jnp.sum(out["x"].astype(jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    v2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g1, g2,
    )
