#!/bin/bash
# Full-pipeline smoke: fixture images -> extract_latent -> lmdb2wds ->
# train (lmdb) -> generate (+VAE decode) -> fid ref/calc. Exercises every
# CLI end-to-end with a fabricated (random-weight) VAE checkpoint; takes
# ~15 min cold on one v5e (compiles), ~3 min warm.
set -e
cd /root/repo
ROOT=/tmp/pipe
rm -rf $ROOT && mkdir -p $ROOT/raw/train

python - <<'EOF'
import numpy as np, os, sys
sys.path.insert(0, "/root/repo")
from PIL import Image
import torch
rng = np.random.RandomState(0)
for cls in ("c0", "c1"):
    os.makedirs(f"/tmp/pipe/raw/train/{cls}", exist_ok=True)
    for i in range(8):
        arr = rng.randint(0, 255, size=(72, 72, 3), dtype=np.uint8)
        Image.fromarray(arr).save(f"/tmp/pipe/raw/train/{cls}/{i}.png")
# fabricate a format-correct random VAE checkpoint
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from maskdit_tpu.models.vae import AutoencoderKL
from maskdit_tpu.utils.port import export_vae
model = AutoencoderKL()
shapes = jax.eval_shape(lambda r: model.init(r, jnp.zeros((1,3,16,16)), jax.random.PRNGKey(1)), jax.random.PRNGKey(0))["params"]
params = jax.tree.map(lambda s: (np.random.default_rng(abs(hash(s.shape)) % 9973).normal(size=s.shape) * 0.05).astype(np.float32), shapes)
state = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in export_vae(params).items()}
torch.save(state, "/tmp/pipe/autoencoder_kl.pth")
print("fixture + random VAE ready", flush=True)
EOF

echo "=== extract_latent ==="
python extract_latent.py --data_name pipe --data_dir /tmp/pipe/raw --split train \
  --resolution 64 --batch_size 8 --ckpt /tmp/pipe/autoencoder_kl.pth \
  --outdir /tmp/pipe/latents 2>&1 | grep -v WARNING | tail -2

echo "=== lmdb2wds ==="
python lmdb2wds.py --datadir /tmp/pipe/latents/pipe_64_latent_lmdb \
  --outdir /tmp/pipe/wds --resolution 8 --num_channels 8 --maxcount 10 \
  2>&1 | grep -v WARNING | tail -1

echo "=== train (lmdb latents) ==="
python train.py --config configs/train/synthetic-smoke.yaml \
  --results_dir /tmp/pipe/results --num_workers 1 --max_steps 4 \
  data.category=lmdb data.root=/tmp/pipe/latents/pipe_64_latent_lmdb \
  data.dataset=pipe data.resolution=8 model.in_size=8 model.num_classes=2 \
  log.ckpt_every=4 log.log_every=2 2>&1 | grep -v WARNING | tail -3

echo "=== generate (with VAE decode to PNG) ==="
CKPT=$(ls -d /tmp/pipe/results/*/checkpoints/4 | head -1)
python generate.py --ckpt_path "$CKPT" --outdir /tmp/pipe/samples \
  --seeds 0-7 --max_batch_size 4 --model_type DiT-S/2 --image_size 8 \
  --num_classes 2 --use_decoder True --mae_loss_coef 0.1 --num_steps 4 \
  --cfg_scale 1.5 --pretrained_path /tmp/pipe/autoencoder_kl.pth \
  2>&1 | grep -v WARNING | tail -2
ls /tmp/pipe/samples/*.png | head -3

echo "=== fid ref + calc ==="
python fid.py ref --data /tmp/pipe/raw/train --dest /tmp/pipe/ref.npz --batch 8 --random_detector 2>&1 | grep -v WARNING | tail -1
python fid.py calc --images /tmp/pipe/samples --ref /tmp/pipe/ref.npz --num 8 --batch 8 --random_detector 2>&1 | grep -v WARNING | tail -1
echo "=== PIPELINE COMPLETE ==="
