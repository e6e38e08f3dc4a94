#!/bin/bash
# Multi-host TPU training, ImageNet-512 (reference: scripts/train_latent512.sh,
# which used `accelerate launch --num_machines 4 --num_processes 32`).
# On TPU pods, run this same command on every host; JAX auto-discovers the
# pod topology. For manual clusters pass --coordinator/--num_processes/
# --process_id explicitly.
python3 train.py --config configs/train/imagenet512-latent.yaml
