from maskdit_tpu.data import lmdb_lite
from maskdit_tpu.data.datasets import (
    Dataset,
    ImageFolderDataset,
    ImageNetLatentDataset,
    SyntheticLatentDataset,
    center_crop_arr,
    write_latent_lmdb,
)

__all__ = [
    "lmdb_lite", "Dataset", "ImageFolderDataset", "ImageNetLatentDataset",
    "SyntheticLatentDataset", "center_crop_arr", "write_latent_lmdb",
]
