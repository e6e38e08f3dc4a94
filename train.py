"""Training CLI (reference train.py equivalent, LMDB/latent datasets).

Usage:
  python train.py --config configs/train/imagenet256-latent.yaml \
      [--results_dir results] [--ckpt_path ...] [overrides key=value ...]

Mirrors the reference argparse surface (train.py:294-333); config files use
the same YAML schema so reference configs port 1:1. One entry point serves
both the LMDB (256) and WDS (512) pipelines — set data.category in the
config (the reference split these into train.py / train_wds.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)
if os.environ.get("MASKDIT_PLATFORM"):
    # force a backend (e.g. cpu for debugging / CI): this environment's
    # sitecustomize ignores JAX_PLATFORMS, so the config route is the
    # only one that works. CPU multi-process needs gloo collectives.
    jax.config.update("jax_platforms", os.environ["MASKDIT_PLATFORM"])
    if os.environ["MASKDIT_PLATFORM"] == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

from maskdit_tpu.parallel import init_distributed, is_main_process, mprint
from maskdit_tpu.utils import config as config_lib
from maskdit_tpu.utils.logging import Logger, parse_str_none, str2bool


def make_eval_hook(cfg, args):
    """Sample-and-FID hook run after each checkpoint (train.py:273-287)."""
    import jax.numpy as jnp

    from maskdit_tpu.evals import fid as fid_lib
    from maskdit_tpu.models import create_model
    from maskdit_tpu.sampling.generate import SamplerConfig, generate_with_params
    from maskdit_tpu.utils.logging import parse_float_none, parse_int_list

    seeds = parse_int_list(args.eval_seeds)
    cfg_scale = parse_float_none(args.cfg_scale)
    if cfg_scale is None:
        # finetune configs carry eval.cfg_scales (reference:
        # configs/finetune/*.yaml); use the first entry when the CLI
        # didn't specify one
        scales = cfg.eval.get("cfg_scales")
        if scales:
            cfg_scale = float(scales[0])

    eval_model = create_model(
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

    from maskdit_tpu.models.vae import AutoencoderKL
    from maskdit_tpu.utils.port import convert_vae, load_torch_state_dict

    vae = AutoencoderKL()
    vae_params = jax.tree.map(
        jnp.asarray, convert_vae(load_torch_state_dict(args.pretrained_path))
    )
    decode = jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode"))
    vae_apply = lambda z: decode(vae_params, z)

    import fid as fid_cli

    # --random_detector exists for dry-wiring the hook without the
    # pytorch-fid asset (FID values are then meaningless; build_detector
    # prints the warning). Production runs pass --detector_path.
    detector = fid_cli.build_detector(args)

    def hook(step: int, ema_params) -> dict:
        outdir = os.path.join(
            args.results_dir, "fid",
            f"edm-steps{args.num_steps}-ckpt{step}_cfg{cfg_scale}",
        )
        generate_with_params(
            eval_model, ema_params, seeds, outdir,
            SamplerConfig(num_steps=args.num_steps, cfg_scale=cfg_scale),
            vae_apply=vae_apply, max_batch_size=args.max_batch_size,
            rank=jax.process_index(), world=jax.process_count(),
        )
        value = fid_lib.calc(
            outdir, cfg.eval.ref_path, args.num_expected, args.global_seed,
            args.fid_batch_size, detector,
        )
        return {"fid": value}

    return hook


def main() -> None:
    parser = argparse.ArgumentParser("training parameters")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--results_dir", type=str, default="results")
    parser.add_argument("--ckpt_path", type=parse_str_none, default=None)
    parser.add_argument("--global_seed", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--use_strict_load", type=str2bool, default=True)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="override config.train.max_num_steps")
    parser.add_argument("--mesh", type=str, default=None,
                        help="mesh spec, e.g. data=8,fsdp=1,tensor=1")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address host:port")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    # in-training FID eval (reference: train.py:273-287)
    parser.add_argument("--enable_eval", action="store_true")
    parser.add_argument("--eval_seeds", type=str, default="0-9999")
    parser.add_argument("--cfg_scale", type=str, default="None")
    parser.add_argument("--num_steps", type=int, default=40)
    parser.add_argument("--max_batch_size", type=int, default=50)
    parser.add_argument("--num_expected", type=int, default=10000)
    parser.add_argument("--fid_batch_size", type=int, default=64)
    parser.add_argument("--pretrained_path", type=str,
                        default="assets/stable_diffusion/autoencoder_kl.pth")
    parser.add_argument("--detector_path", type=str, default=None)
    parser.add_argument("--random_detector", action="store_true",
                        help="random InceptionV3 weights: dry-wires the "
                             "eval hook when the pytorch-fid asset is "
                             "unavailable (FID values are meaningless)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="raise on NaN/Inf in any compiled computation")
    parser.add_argument("overrides", nargs="*",
                        help="config overrides: a.b.c=value")
    args = parser.parse_args()

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    init_distributed(args.coordinator, args.num_processes, args.process_id)

    cfg = config_lib.load(args.config)
    config_lib.apply_dotlist(cfg, args.overrides)
    config_lib.validate(cfg, [
        "data.resolution", "data.num_channels", "model.model_type",
        "model.precond", "model.mask_ratio", "train.batchsize", "train.lr",
        "train.max_num_steps", "log.log_every", "log.ckpt_every",
    ])

    mesh_shape = None
    if args.mesh:
        mesh_shape = dict(
            (k, int(v)) for k, v in
            (pair.split("=") for pair in args.mesh.split(","))
        )

    from maskdit_tpu.train.trainer import Trainer

    eval_hook = None
    if args.enable_eval:
        eval_hook = make_eval_hook(cfg, args)

    trainer = Trainer(
        cfg,
        results_dir=args.results_dir,
        seed=args.global_seed,
        ckpt_path=args.ckpt_path,
        use_wandb=args.use_wandb,
        mesh_shape=mesh_shape,
        num_workers=args.num_workers,
        max_steps_override=args.max_steps,
        eval_hook=eval_hook,
    )
    logger = None
    if is_main_process():
        logger = Logger(
            file_name=os.path.join(trainer.exp_dir, "log.txt"),
            file_mode="a+",
        )
    try:
        trainer.train()
    finally:
        if logger is not None:
            logger.close()
    mprint("Done!")


if __name__ == "__main__":
    main()
