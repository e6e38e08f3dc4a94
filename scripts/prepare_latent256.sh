#!/bin/bash
# Encode ImageNet 256x256 into latent space (reference: scripts/prepare_latent256.sh)
python3 extract_latent.py --resolution 256 --ckpt assets/stable_diffusion/autoencoder_kl.pth \
    --batch_size 64 --outdir ../data/imagenet256-latent
