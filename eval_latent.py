"""Eval CLI (reference eval_latent.py equivalent): checkpoint -> samples -> FID.

  python eval_latent.py --config configs/test/maskdit-256.yaml \
      --ckpt_path <ckpt> --cfg_scale 1.5 --num_steps 40 \
      --detector_path assets/pt_inception-2015-12-05.pth
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)
import jax.numpy as jnp

from maskdit_tpu.evals import fid as fid_lib
from maskdit_tpu.models import create_model
from maskdit_tpu.parallel import barrier, init_distributed, mprint
from maskdit_tpu.sampling.generate import SamplerConfig, generate_with_params
from maskdit_tpu.utils import config as config_lib
from maskdit_tpu.utils.logging import parse_float_none, parse_int_list


def main() -> None:
    parser = argparse.ArgumentParser("evaluation parameters")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--outdir", type=str, default="eval_out")
    parser.add_argument("--seeds", type=parse_int_list, default="0-49999")
    parser.add_argument("--cfg_scale", type=parse_float_none, default=None)
    parser.add_argument("--num_steps", type=int, default=40)
    parser.add_argument("--max_batch_size", type=int, default=50)
    parser.add_argument("--num_expected", type=int, default=50000)
    parser.add_argument("--fid_batch_size", type=int, default=64)
    parser.add_argument("--global_seed", type=int, default=0)
    parser.add_argument("--pretrained_path", type=str,
                        default="assets/stable_diffusion/autoencoder_kl.pth")
    parser.add_argument("--detector_path", type=str, default=None)
    parser.add_argument("--random_detector", action="store_true")
    parser.add_argument("--skip_fid", action="store_true")
    args = parser.parse_args()

    init_distributed()
    cfg = config_lib.load(args.config)

    model = create_model(
        cfg.model.precond,
        img_resolution=cfg.model.in_size,
        img_channels=cfg.model.in_channels,
        num_classes=cfg.model.num_classes,
        model_type=cfg.model.model_type,
        use_decoder=cfg.model.use_decoder,
        mae_loss_coef=cfg.model.mae_loss_coef,
        pad_cls_token=cfg.model.get("pad_cls_token", False),
        dtype=jnp.bfloat16,
    )

    # EMA params from reference .pt or orbax
    import generate as gen_cli

    args.use_strict_load = True
    args.model_type = cfg.model.model_type
    params = gen_cli.load_params(args, model)
    mprint(f"loaded EMA weights from {args.ckpt_path}")

    from maskdit_tpu.models.vae import AutoencoderKL
    from maskdit_tpu.utils.port import convert_vae, load_torch_state_dict

    vae = AutoencoderKL()
    vae_params = jax.tree.map(
        jnp.asarray, convert_vae(load_torch_state_dict(args.pretrained_path))
    )
    decode = jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode"))
    vae_apply = lambda z: decode(vae_params, z)

    outdir = os.path.join(
        args.outdir,
        f"edm-steps{args.num_steps}-cfg{args.cfg_scale}",
    )
    t0 = time.time()
    generate_with_params(
        model, params, args.seeds, outdir,
        SamplerConfig(num_steps=args.num_steps, cfg_scale=args.cfg_scale),
        vae_apply=vae_apply, max_batch_size=args.max_batch_size,
        rank=jax.process_index(), world=jax.process_count(),
    )
    barrier("generate")
    mprint(f"generation took {time.time() - t0:.1f}s")

    if not args.skip_fid:
        import fid as fid_cli

        detector = fid_cli.build_detector(args)
        value = fid_lib.calc(
            outdir, cfg.eval.ref_path, args.num_expected, args.global_seed,
            args.fid_batch_size, detector,
        )
        mprint(f"cfg_scale: {args.cfg_scale} FID: {value:.4f}")


if __name__ == "__main__":
    main()
