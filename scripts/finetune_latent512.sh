#!/bin/bash
# Unmasked finetune from a released 512 checkpoint (reference:
# scripts/finetune_latent512.sh). --ckpt_path accepts the reference .pt
# (converted on import, non-strict to tolerate the absent mask token).
python3 train.py --config configs/finetune/imagenet512-latent.yaml \
    --ckpt_path checkpoints/1050000.pt --use_strict_load False
