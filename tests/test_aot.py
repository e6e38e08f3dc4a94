"""AOT sampler export: serialize -> reload -> identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.models import create_model
from maskdit_tpu.sampling.aot import export_sampler, load_sampler
from maskdit_tpu.sampling.generate import SamplerConfig, make_sample_fn


def test_aot_export_roundtrip(tiny_dit):
    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=6,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    x0 = jnp.zeros((1, 4, 8, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.ones((1,)),
        jnp.zeros((1, 6)),
    )
    params = variables["params"]
    cfg = SamplerConfig(num_steps=4, cfg_scale=1.5)

    blob = export_sampler(model, params, cfg, batch_size=2)
    assert isinstance(blob, bytes) and len(blob) > 1000

    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    labels = jax.nn.one_hot(jnp.array([1, 3]), 6)
    rng = jax.random.PRNGKey(7)

    loaded = load_sampler(blob)
    out_aot = loaded(params, latents, labels, rng)

    live = make_sample_fn(model, params, cfg)
    out_live = live(latents, labels, rng)
    np.testing.assert_allclose(
        np.asarray(out_aot), np.asarray(out_live), atol=1e-5
    )


def test_generate_cli_export_aot(tiny_dit, tmp_path, monkeypatch):
    """generate.py --export_aot writes a reloadable sampler blob from an
    orbax checkpoint (the CLI surface over export_sampler)."""
    import sys

    import orbax.checkpoint as ocp

    import generate as generate_cli

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=6,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 4, 8, 8)),
        jnp.ones((1,)), jnp.zeros((1, 6)),
    )["params"]
    ckpt_dir = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt_dir), {"ema_params": jax.device_get(params)})
    ckptr.close()

    blob_path = tmp_path / "sampler.bin"
    monkeypatch.setattr(sys, "argv", [
        "generate.py", "--ckpt_path", str(ckpt_dir),
        "--export_aot", str(blob_path),
        "--model_type", "DiT-S/2", "--image_size", "8",
        "--num_classes", "6", "--use_decoder", "true",
        "--mae_loss_coef", "0.1", "--fp32",
        "--num_steps", "2", "--cfg_scale", "1.5", "--max_batch_size", "2",
    ])
    generate_cli.main()

    loaded = load_sampler(blob_path.read_bytes())
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    labels = jax.nn.one_hot(jnp.array([1, 3]), 6)
    out = loaded(params, latents, labels, jax.random.PRNGKey(7))
    assert out.shape == (2, 4, 8, 8) and np.isfinite(np.asarray(out)).all()
