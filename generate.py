"""Sampling CLI (reference generate.py equivalent).

Usage:
  python generate.py --ckpt_path <ckpt.pt|orbax dir> --outdir out \
      --seeds 0-63 [--class_idx 207] [--cfg_scale 1.5] [--num_steps 40] ...

Loads EMA weights from either a released reference ``.pt`` checkpoint
(converted on the fly) or one of our orbax checkpoints, samples with the
EDM/ablation sampler, decodes through the SD-VAE, and writes per-seed PNGs.

Class-sample mode (reference generate.py:39-60): pass ``--config`` (model
YAML), ``--label_dict assets/imagenet_label.json``, ``--class_idx N`` and
``--results_dir``; samples land in ``<results_dir>/<class_name>/``. The
reference reads ``config.model.self_cond`` there, a key no shipped config
defines — we honor it when present and fall back to False.
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
import jax.numpy as jnp

from maskdit_tpu.models import create_model
from maskdit_tpu.models.dit import DIT_CONFIGS
from maskdit_tpu.parallel import init_distributed, mprint
from maskdit_tpu.sampling.generate import SamplerConfig, generate_with_params
from maskdit_tpu.utils.logging import (
    Logger,
    parse_float_none,
    parse_int_list,
    str2bool,
)


def load_params(args, model):
    """EMA params from a reference .pt or an orbax checkpoint dir."""
    if args.ckpt_path.endswith((".pt", ".pth")):
        from maskdit_tpu.utils.ckpt import graft_params, load_reference_checkpoint

        loaded = load_reference_checkpoint(
            args.ckpt_path, use_ema=True, strict=args.use_strict_load
        )
        init = jax.eval_shape(
            lambda r: model.init(
                {"params": r},
                jnp.zeros((1, model.img_channels, model.img_resolution,
                           model.img_resolution)),
                jnp.ones((1,)),
                jnp.zeros((1, model.num_classes)) if model.num_classes else None,
            ),
            jax.random.PRNGKey(0),
        )["params"]
        import numpy as np

        zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), init)
        return jax.tree.map(jnp.asarray, graft_params(zeros, loaded))
    # orbax checkpoint: restore ema_params from a TrainState save
    import orbax.checkpoint as ocp

    path = os.path.abspath(args.ckpt_path)
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")  # CheckpointManager item layout
    ckpt = ocp.StandardCheckpointer().restore(path)
    tree = ckpt.get("ema_params", ckpt.get("params", ckpt))
    return jax.tree.map(jnp.asarray, tree)


def main() -> None:
    parser = argparse.ArgumentParser("sampling parameters")
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--outdir", type=str, default=None,
                        help="output dir; or use --label_dict/--results_dir")
    parser.add_argument("--config", type=str, default=None,
                        help="model YAML; overrides the --model_type/... flags "
                        "(reference generate.py builds the model from config)")
    parser.add_argument("--label_dict", type=str, default=None,
                        help="JSON {class_idx: [synset, class_name]}; with "
                        "--class_idx, samples go to <results_dir>/<class_name>")
    parser.add_argument("--results_dir", type=str, default="samples")
    parser.add_argument("--seeds", type=parse_int_list, default="0-63")
    parser.add_argument("--subdirs", action="store_true")
    parser.add_argument("--class_idx", type=int, default=None)
    parser.add_argument("--max_batch_size", type=int, default=64)
    parser.add_argument("--cfg_scale", type=parse_float_none, default=None)
    parser.add_argument("--num_steps", type=int, default=18)
    parser.add_argument("--S_churn", type=int, default=0)
    parser.add_argument("--solver", type=str, default=None,
                        choices=["euler", "heun"])
    parser.add_argument("--discretization", type=str, default=None,
                        choices=["vp", "ve", "iddpm", "edm"])
    parser.add_argument("--schedule", type=str, default=None,
                        choices=["vp", "ve", "linear"])
    parser.add_argument("--scaling", type=str, default=None,
                        choices=["vp", "none"])
    parser.add_argument("--pretrained_path", type=str,
                        default="assets/stable_diffusion/autoencoder_kl.pth")
    parser.add_argument("--no_decode", action="store_true",
                        help="save raw latents as .npy instead of PNGs")
    parser.add_argument("--image_size", type=int, default=32)
    parser.add_argument("--image_channels", type=int, default=4)
    parser.add_argument("--num_classes", type=int, default=1000)
    parser.add_argument("--model_type", type=str,
                        choices=list(DIT_CONFIGS), default="DiT-XL/2")
    parser.add_argument("--precond", type=str, default="edm",
                        choices=["edm"])
    parser.add_argument("--use_decoder", type=str2bool, default=False)
    parser.add_argument("--pad_cls_token", type=str2bool, default=False)
    parser.add_argument("--mae_loss_coef", type=float, default=0)
    parser.add_argument("--ext_feature_dim", type=int, default=0)
    parser.add_argument("--use_encoder_feat", type=str2bool, default=False,
                        help="self-conditioning via pooled encoder feature "
                        "(the reference's generate.py reads an undefined "
                        "config.model.self_cond here — SURVEY.md §5)")
    parser.add_argument("--feat_path", type=str, default="")
    parser.add_argument("--sample_mode", type=str, default="rand_full",
                        choices=["rand_full", "rand_repeat", "rand_y"])
    parser.add_argument("--use_strict_load", type=str2bool, default=True)
    parser.add_argument("--export_aot", type=str, default="",
                        help="instead of sampling, serialize the compiled "
                        "sampler (jax.export StableHLO) for batch "
                        "--max_batch_size to this path and exit; reload "
                        "with maskdit_tpu.sampling.aot.load_sampler")
    parser.add_argument("--fp32", action="store_true",
                        help="run the denoiser in fp32 (parity mode)")
    args = parser.parse_args()

    if args.config is not None:
        # Model hyperparameters from YAML (reference generate.py:31-39).
        from maskdit_tpu.utils import config as config_lib

        m = config_lib.load(args.config).model
        args.model_type = m.model_type
        args.image_size = m.in_size
        args.image_channels = m.in_channels
        args.num_classes = m.num_classes
        args.precond = m.precond
        args.use_decoder = m.use_decoder
        args.mae_loss_coef = m.get("mae_loss_coef", 0)
        args.pad_cls_token = m.get("pad_cls_token", False)
        args.ext_feature_dim = m.get("ext_feature_dim", 0)
        # the reference reads m.self_cond unconditionally — a latent bug
        # since no shipped config defines it; tolerate absence.
        args.use_encoder_feat = m.get("self_cond", False)

    if args.label_dict is not None:
        from maskdit_tpu.sampling.generate import resolve_class_outdir

        if args.class_idx is None:
            parser.error("--label_dict requires --class_idx")
        args.outdir, class_name = resolve_class_outdir(
            args.label_dict, args.class_idx, args.results_dir
        )
        print(f"sampling class {args.class_idx} ({class_name}) "
              f"into {args.outdir}")
    elif args.outdir is None and not args.export_aot:
        parser.error("one of --outdir or --label_dict is required")

    init_distributed()
    rank = jax.process_index()
    world = jax.process_count()

    if args.outdir is not None:
        os.makedirs(args.outdir, exist_ok=True)
    logger = None
    if rank == 0 and args.outdir is not None:
        logger = Logger(os.path.join(args.outdir, "log.txt"), "a+")

    if args.fp32:
        jax.config.update("jax_default_matmul_precision", "highest")

    model = create_model(
        args.precond,
        img_resolution=args.image_size,
        img_channels=args.image_channels,
        num_classes=args.num_classes,
        model_type=args.model_type,
        use_decoder=args.use_decoder,
        mae_loss_coef=args.mae_loss_coef,
        pad_cls_token=args.pad_cls_token,
        ext_feature_dim=args.ext_feature_dim,
        use_encoder_feat=args.use_encoder_feat,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
    )
    params = load_params(args, model)
    mprint(f"loaded weights from {args.ckpt_path}")

    sampler_cfg = SamplerConfig(
        num_steps=args.num_steps,
        cfg_scale=args.cfg_scale,
        S_churn=args.S_churn,
        solver=args.solver,
        discretization=args.discretization,
        schedule=args.schedule,
        scaling=args.scaling,
    )

    if args.export_aot:
        # export needs no VAE: the blob is the denoiser scan only
        from maskdit_tpu.sampling.aot import export_sampler

        blob = export_sampler(model, params, sampler_cfg, args.max_batch_size)
        with open(args.export_aot, "wb") as f:
            f.write(blob)
        mprint(
            f"exported compiled sampler (batch {args.max_batch_size}, "
            f"{len(blob)/1e6:.1f} MB) to {args.export_aot}"
        )
        if logger is not None:
            logger.close()
        return

    vae_apply = None
    if not args.no_decode:
        from maskdit_tpu.models.vae import AutoencoderKL
        from maskdit_tpu.utils.port import convert_vae, load_torch_state_dict

        vae = AutoencoderKL()
        vae_params = convert_vae(load_torch_state_dict(args.pretrained_path))
        vae_params = jax.tree.map(jnp.asarray, vae_params)
        decode = jax.jit(
            lambda p, z: vae.apply({"params": p}, z, method="decode")
        )
        vae_apply = lambda z: decode(vae_params, z)

    mprint(
        f"generating {len(args.seeds)} images to {args.outdir} "
        f"(cfg={args.cfg_scale}, steps={args.num_steps})"
    )
    feat_fn = None
    if args.feat_path and args.ext_feature_dim > 0:
        if args.class_idx is not None:
            parser.error(
                "--class_idx cannot combine with --feat_path: retrieved "
                "feature rows carry their own matching class labels"
            )
        # external-feature conditioning: draw (feature, matching label)
        # rows from the feature LMDB per batch. The reference ships the
        # same retrieval utility but hardwires feat=None in its loop
        # ("support random only", sample.py:269-270); here the path is
        # actually driveable. Seeded by the batch's first seed so any
        # rank/world split retrieves identical rows for identical batches.
        from maskdit_tpu.data.features import retrieve_n_features

        feat_fn = lambda batch_seeds: retrieve_n_features(
            len(batch_seeds), args.feat_path, args.ext_feature_dim,
            args.num_classes, sample_mode=args.sample_mode,
            seed=int(batch_seeds[0]),
        )

    generate_with_params(
        model, params, args.seeds, args.outdir, sampler_cfg,
        vae_apply=vae_apply, class_idx=args.class_idx,
        max_batch_size=args.max_batch_size, rank=rank, world=world,
        subdirs=args.subdirs, save_latents=args.no_decode,
        feat_fn=feat_fn,
    )
    mprint("Done!")
    if logger is not None:
        logger.close()


if __name__ == "__main__":
    main()
