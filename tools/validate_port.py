"""Offline validation harness for released-checkpoint ports.

Run once the reference assets are available (download_assets.py):

  python tools/validate_port.py --ckpt_path imagenet256-guidance.pt \
      --use_decoder True --mae_loss_coef 0.1 \
      [--vae_path autoencoder_kl.pth] [--sample]

Checks, in order:
  1. conversion coverage — every checkpoint key consumed, every model param
     filled, layer-by-layer shape/stat report;
  2. EMA-vs-model delta sanity (EMA should be close to but not equal the
     raw weights for a converged run);
  3. denoiser forward sanity at several sigmas: D(x; sigma) must interpolate
     between x (sigma->0) and the dataset mean scale (sigma->inf), i.e.
     ||D - c_skip x|| grows with sigma while staying bounded;
  4. (--sample) 8-image CFG sample + VAE decode to PNG for eyeballing.

FID-parity itself needs the 50K pipeline (eval_latent.py); this script is
the fast first gate.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.models import create_model
from maskdit_tpu.models.dit import DIT_CONFIGS
from maskdit_tpu.utils import port
from maskdit_tpu.utils.ckpt import graft_params
from maskdit_tpu.utils.logging import str2bool


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--model_type", default="DiT-XL/2", choices=list(DIT_CONFIGS))
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--use_decoder", type=str2bool, default=True)
    p.add_argument("--mae_loss_coef", type=float, default=0.1)
    p.add_argument("--pad_cls_token", type=str2bool, default=False)
    p.add_argument("--vae_path", default=None)
    p.add_argument("--sample", action="store_true")
    p.add_argument("--outdir", default="port_check")
    args = p.parse_args()

    # 1. conversion coverage
    for key in ("ema", "model"):
        state = port.load_torch_state_dict(args.ckpt_path, key=key)
        converted = port.convert_maskdit(state)
        n_src = len([k for k in state if not k.endswith("pos_embed")])
        n_dst = len(jax.tree.leaves(converted))
        print(f"[{key}] {n_src} checkpoint tensors -> {n_dst} params")
        for path_, leaf in jax.tree_util.tree_leaves_with_path(converted):
            name = jax.tree_util.keystr(path_)
            a = np.asarray(leaf)
            if not np.isfinite(a).all():
                print(f"  NON-FINITE: {name}")
        if key == "ema":
            ema_tree = converted
        else:
            model_tree = converted

    # 2. EMA/model delta
    deltas = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(ema_tree), jax.tree.leaves(model_tree))
    ]
    print(f"EMA vs model: max|delta|={max(deltas):.3e} (0 would be suspicious)")

    # 3. denoiser sanity across sigmas
    model = create_model(
        "edm", img_resolution=args.image_size, img_channels=4,
        num_classes=args.num_classes, model_type=args.model_type,
        use_decoder=args.use_decoder, mae_loss_coef=args.mae_loss_coef,
        pad_cls_token=args.pad_cls_token, dtype=jnp.bfloat16,
    )
    init = jax.eval_shape(
        lambda r: model.init(
            {"params": r},
            jnp.zeros((1, 4, args.image_size, args.image_size)),
            jnp.ones((1,)),
            jnp.zeros((1, args.num_classes)),
        ),
        jax.random.PRNGKey(0),
    )["params"]
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), init)
    params = jax.tree.map(jnp.asarray, graft_params(zeros, ema_tree))

    x = jax.random.normal(
        jax.random.PRNGKey(1), (4, 4, args.image_size, args.image_size)
    )
    y = jax.nn.one_hot(jnp.array([207, 360, 387, 974]) % args.num_classes,
                       args.num_classes)
    fwd = jax.jit(
        lambda p, x, s: model.apply(
            {"params": p}, x, jnp.full((x.shape[0],), s), y
        )["x"]
    )
    print("sigma -> ||D||/||x||, ||D - c_skip*x||:")
    for sigma in (0.02, 0.5, 2.0, 20.0, 80.0):
        d = np.asarray(fwd(params, x * sigma, sigma))
        c_skip = 0.25 / (sigma ** 2 + 0.25)
        resid = np.linalg.norm(d - c_skip * np.asarray(x) * sigma)
        print(f"  {sigma:6.2f} -> {np.linalg.norm(d)/np.linalg.norm(x):8.4f}, "
              f"{resid:10.2f}")

    # 4. optional sample
    if args.sample:
        from maskdit_tpu.sampling.generate import (
            SamplerConfig, generate_with_params,
        )

        vae_apply = None
        if args.vae_path:
            from maskdit_tpu.models.vae import AutoencoderKL
            from maskdit_tpu.utils.port import convert_vae, load_torch_state_dict

            vae = AutoencoderKL()
            vp = jax.tree.map(
                jnp.asarray, convert_vae(load_torch_state_dict(args.vae_path))
            )
            decode = jax.jit(
                lambda p, z: vae.apply({"params": p}, z, method="decode")
            )
            vae_apply = lambda z: decode(vp, z)
        generate_with_params(
            model, params, list(range(8)), args.outdir,
            SamplerConfig(num_steps=40, cfg_scale=1.5),
            vae_apply=vae_apply, max_batch_size=8,
            save_latents=vae_apply is None,
        )
        print(f"wrote samples to {args.outdir}")


if __name__ == "__main__":
    main()
