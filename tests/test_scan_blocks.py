"""Scan-over-blocks layout: math parity with the unrolled layout."""

import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.models import create_model
from maskdit_tpu.utils.port import stack_scan_blocks, unstack_scan_blocks


def _models():
    kw = dict(
        img_resolution=8, img_channels=4, num_classes=6,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    return (
        create_model("edm", **kw),
        create_model("edm", scan_blocks=True, **kw),
    )


def test_scan_blocks_match_unrolled(tiny_dit):
    unrolled, scanned = _models()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    sigma = jnp.array([0.5, 2.0])
    y = jax.nn.one_hot(jnp.array([1, 2]), 6)

    variables = unrolled.init(
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
        x, sigma, y,
    )
    # randomize (zero-init layers would hide block mixups)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(p.size % 101), p.shape) * 0.04,
        variables["params"],
    )
    stacked = jax.tree.map(jnp.asarray, stack_scan_blocks(
        jax.tree.map(np.asarray, params)
    ))

    out_a = unrolled.apply({"params": params}, x, sigma, y)
    out_b = scanned.apply({"params": stacked}, x, sigma, y)
    np.testing.assert_allclose(
        np.asarray(out_a["x"]), np.asarray(out_b["x"]), atol=1e-5
    )

    # masked training forward too (same mask rng -> same gather)
    out_a = unrolled.apply(
        {"params": params}, x, sigma, y, mask_ratio=0.5, train=True,
        rngs={"mask": jax.random.PRNGKey(3)},
    )
    out_b = scanned.apply(
        {"params": stacked}, x, sigma, y, mask_ratio=0.5, train=True,
        rngs={"mask": jax.random.PRNGKey(3)},
    )
    np.testing.assert_allclose(
        np.asarray(out_a["x"]), np.asarray(out_b["x"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["mask"]), np.asarray(out_b["mask"])
    )


def test_stack_unstack_roundtrip():
    unrolled, scanned = _models()
    x = jnp.zeros((1, 4, 8, 8))
    variables = scanned.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x, jnp.ones((1,)), jnp.zeros((1, 6)),
    )
    stacked = jax.tree.map(np.asarray, variables["params"])
    unstacked = unstack_scan_blocks(stacked)
    assert "blocks_0" in unstacked["model"] and "blocks_11" in unstacked["model"]
    restacked = stack_scan_blocks(unstacked)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(stacked),
        jax.tree_util.tree_leaves_with_path(restacked),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(a, b)


def test_scan_param_shardings(tiny_dit):
    from maskdit_tpu.parallel import create_mesh, param_specs, shardings_for

    _, scanned = _models()
    x = jnp.zeros((1, 4, 8, 8))
    shapes = jax.eval_shape(
        lambda r: scanned.init(
            {"params": r, "mask": jax.random.PRNGKey(1)},
            x, jnp.ones((1,)), jnp.zeros((1, 6)),
        ),
        jax.random.PRNGKey(0),
    )["params"]
    mesh = create_mesh({"data": 2, "fsdp": 2, "tensor": 2})
    specs = param_specs(shapes)
    qkv_spec = specs["model"]["blocks"]["scan"]["block"]["attn"]["qkv"]["kernel"]
    shardings = shardings_for(shapes, specs, mesh)
    qkv_sh = shardings["model"]["blocks"]["scan"]["block"]["attn"]["qkv"]["kernel"]
    # stacked (depth, in, out): stack axis replicated, matrix dims sharded
    assert qkv_sh.spec == jax.sharding.PartitionSpec(None, "fsdp", "tensor")
