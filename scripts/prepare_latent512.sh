#!/bin/bash
# Encode ImageNet 512x512 into latents, then shard to WebDataset
# (reference: scripts/prepare_latent512.sh)
python3 extract_latent.py --resolution 512 --ckpt assets/stable_diffusion/autoencoder_kl.pth \
    --batch_size 64 --outdir ../data/imagenet512-latent
python3 lmdb2wds.py --maxcount 10010 --datadir ../data/imagenet512-latent \
    --outdir ../data/imagenet512-latent-wds --resolution 64 --num_channels 8
