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

from maskdit_tpu.parallel import init_distributed, is_main_process, mprint
from maskdit_tpu.utils import config as config_lib
from maskdit_tpu.utils.logging import Logger, parse_str_none, str2bool


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
    parser.add_argument("overrides", nargs="*",
                        help="config overrides: a.b.c=value")
    args = parser.parse_args()

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

    trainer = Trainer(
        cfg,
        results_dir=args.results_dir,
        seed=args.global_seed,
        ckpt_path=args.ckpt_path,
        use_wandb=args.use_wandb,
        mesh_shape=mesh_shape,
        num_workers=args.num_workers,
        max_steps_override=args.max_steps,
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
