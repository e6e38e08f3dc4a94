"""LMDB -> WebDataset tar shard conversion (reference lmdb2wds.py equivalent).

Reads a latent LMDB (ImageNetLatentDataset layout) and writes tar shards
with members {key}.latent (pickled numpy array) and {key}.cls, compatible
with both our WebDatasetLatents reader and webdataset-based consumers.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from maskdit_tpu.data.datasets import ImageNetLatentDataset
from maskdit_tpu.data.wds import write_wds_shards


def main() -> None:
    parser = argparse.ArgumentParser(
        "Convert the latent imagenet dataset to WebDataset"
    )
    parser.add_argument("--maxcount", type=int, default=10010)
    parser.add_argument("--maxsize", type=int, default=10 ** 10)
    parser.add_argument("--outdir", type=str, default="latent_imagenet_wds")
    parser.add_argument("--datadir", type=str, default="latent_imagenet")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--num_channels", type=int, default=8)
    parser.add_argument("--split", type=str, default="train")
    args = parser.parse_args()

    dataset = ImageNetLatentDataset(
        args.datadir, resolution=args.resolution,
        num_channels=args.num_channels, split=args.split,
    )

    def records():
        for i in range(len(dataset)):
            img, label = dataset[i]
            yield f"{i:07d}", img, int(np.argmax(label))

    pattern = f"latent_imagenet_{args.resolution * 8}_{args.split}-%04d.tar"
    paths = write_wds_shards(
        records(), args.outdir, pattern=pattern,
        maxcount=args.maxcount, maxsize=args.maxsize,
    )
    print(f"wrote {len(paths)} shards to {args.outdir}")


if __name__ == "__main__":
    main()
