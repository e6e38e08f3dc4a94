#!/bin/bash
# Single-host TPU training, ImageNet-256 pretrain at mask 0.5.
# The mesh spans all local devices on the 'data' axis by default.
python3 train.py --config configs/train/imagenet256-latent.yaml
