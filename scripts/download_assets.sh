#!/bin/bash
# Fetch pretrained assets (reference: scripts/download_assets.sh)
python3 download_assets.py --name vae --dest assets/stable_diffusion
python3 download_assets.py --name imagenet256-latent-lmdb --dest ../data/imagenet256/train
python3 download_assets.py --name imagenet512-latent-wds --dest ../data/imagenet512-wds
python3 download_assets.py --name imagenet256 --dest assets/fid_stats
python3 download_assets.py --name imagenet512 --dest assets/fid_stats
