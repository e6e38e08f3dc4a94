"""Latent extraction CLI (reference extract_latent.py equivalent).

ImageNet image folder -> SD-VAE encode_moments -> latent LMDB with keys
z-{i} (float32 moments), y-{i} (label text), 'length'. Optional --xflip
appends horizontally-flipped latents with continuing indices (reference:
extract_latent.py:81-103), which is what the Dataset xflip indexing expects.

The VAE encode runs batched and jitted on TPU; LMDB writing uses the
native lmdb_lite writer (no lmdb C dependency).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
)
import jax.numpy as jnp
import numpy as np
from PIL import Image

from maskdit_tpu.data.datasets import center_crop_arr
from maskdit_tpu.data.lmdb_lite import Writer
from maskdit_tpu.models.vae import AutoencoderKL
from maskdit_tpu.utils.port import convert_vae, load_torch_state_dict


def iter_image_folder(root: str, resolution: int):
    """Yield (image[-1,1] CHW float32, class_index) in deterministic order.

    Reads through the raw-image LMDB cache (reference:
    imagenet_lmdb_dataset, datasets.py:55-88) built on first use.
    """
    from maskdit_tpu.data.datasets import imagenet_lmdb_dataset

    ds = imagenet_lmdb_dataset(root, resolution=resolution)
    for i in range(len(ds)):
        img, onehot = ds[i]
        arr = img.astype(np.float32) / 127.5 - 1.0
        yield arr, int(np.argmax(onehot))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_name", default="imagenet", type=str)
    parser.add_argument("--data_dir", default="../datasets", type=str)
    parser.add_argument("--ckpt", default="assets/vae/autoencoder_kl.pth", type=str)
    parser.add_argument("--resolution", default=512, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--split", default="train", type=str)
    parser.add_argument("--xflip", action="store_true")
    parser.add_argument("--outdir", type=str, default="../data/imagenet512-latent")
    args = parser.parse_args()
    assert args.split in ("train", "val")

    vae = AutoencoderKL()
    vae_params = jax.tree.map(
        jnp.asarray, convert_vae(load_torch_state_dict(args.ckpt))
    )
    encode_p = jax.jit(
        lambda p, x: vae.apply({"params": p}, x, method="encode_moments")
    )
    encode = lambda x: encode_p(vae_params, x)

    outdir = os.path.join(
        args.outdir, f"{args.data_name}_{args.resolution}_latent_lmdb", args.split
    )
    os.makedirs(outdir, exist_ok=True)
    writer = Writer(outdir)

    root = os.path.join(args.data_dir, args.split)
    passes = [False, True] if args.xflip else [False]
    idx = 0
    begin = time.time()
    for flip in passes:
        batch_imgs, batch_labels = [], []

        def flush():
            nonlocal idx, begin, batch_imgs, batch_labels
            if not batch_imgs:
                return
            x = np.stack(batch_imgs)
            if flip:
                x = x[:, :, :, ::-1]
            moments = np.asarray(encode(jnp.asarray(x)))
            assert moments.shape[-1] == args.resolution // 8
            for moment, lb in zip(moments, batch_labels):
                writer.put(f"z-{idx}", moment.astype(np.float32).tobytes())
                writer.put(f"y-{idx}", str(int(lb)))
                idx += 1
            if idx % 5120 < args.batch_size:
                print(f"saved {idx} latents, {time.time() - begin:.1f}s elapsed")
                begin = time.time()
            batch_imgs, batch_labels = [], []

        for img, label in iter_image_folder(root, args.resolution):
            batch_imgs.append(img)
            batch_labels.append(label)
            if len(batch_imgs) == args.batch_size:
                flush()
        flush()

    writer.put("length", str(idx))
    writer.commit()
    print(f"[finished] saved {idx} latents to {outdir}")


if __name__ == "__main__":
    main()
