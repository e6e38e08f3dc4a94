"""Dataset classes (numpy-native, torch-free).

Mirrors the reference's train_utils/datasets.py surface:
  * ``Dataset`` base with max_size / xflip indexing / one-hot labels
    (reference: datasets.py:142-234)
  * ``ImageNetLatentDataset``: latent LMDB reader with optional feature
    LMDB join (reference: datasets.py:240-304) — backed by lmdb_lite
  * ``ImageFolderDataset``: dir/zip PNG reader for FID (reference:
    datasets.py:310-410)
  * ``center_crop_arr``: ADM center-crop (reference: datasets.py:19-37)
  * ``SyntheticLatentDataset``: deterministic fake latents for tests/bench
    (no reference counterpart — the reference has no test data path)
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from maskdit_tpu.data import lmdb_lite


def center_crop_arr(pil_image: Image.Image, image_size: int) -> Image.Image:
    """ADM center-crop: BOX halvings then BICUBIC resize then crop."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return Image.fromarray(arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size])


class Dataset:
    """Abstract base: max_size subsetting, xflip doubling, one-hot labels.

    xflip follows the reference convention (datasets.py:165-167): the
    *stored* dataset already contains flipped copies in its second half, so
    xflip doubles the index range rather than flipping at load time.
    """

    def __init__(
        self,
        name: str,
        raw_shape: Sequence[int],
        max_size: Optional[int] = None,
        label_dim: int = 1000,
        xflip: bool = False,
        random_seed: int = 0,
    ):
        self._name = name
        self._raw_shape = list(raw_shape)
        self._label_dim = label_dim

        self._raw_idx = np.arange(self._raw_shape[0], dtype=np.int64)
        if max_size is not None and self._raw_idx.size > max_size:
            np.random.RandomState(random_seed % (1 << 31)).shuffle(self._raw_idx)
            self._raw_idx = np.sort(self._raw_idx[:max_size])
        if xflip:
            self._raw_idx = np.concatenate(
                [self._raw_idx, self._raw_idx + self._raw_shape[0]]
            )

    def _load_raw_data(self, raw_idx: int):
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __len__(self) -> int:
        return self._raw_idx.size

    def __getitem__(self, idx: int):
        image, cond = self._load_raw_data(int(self._raw_idx[idx]))
        assert isinstance(image, np.ndarray)
        if isinstance(cond, list):  # [label, feature]
            cond[0] = self._get_onehot(cond[0])
        else:
            cond = self._get_onehot(cond)
        return image.copy(), cond

    def _get_onehot(self, label):
        if isinstance(label, (int, np.integer)) or (
            isinstance(label, np.ndarray) and label.dtype == np.int64
        ):
            onehot = np.zeros(self.label_shape, dtype=np.float32)
            onehot[int(label)] = 1
            label = onehot
        assert isinstance(label, np.ndarray)
        return label.copy()

    @property
    def name(self):
        return self._name

    @property
    def image_shape(self):
        return list(self._raw_shape[1:])

    @property
    def num_channels(self):
        return self.image_shape[0]

    @property
    def resolution(self):
        assert self.image_shape[1] == self.image_shape[2]
        return self.image_shape[1]

    @property
    def label_shape(self):
        return [self._label_dim]

    @property
    def label_dim(self):
        return self._label_dim


class ImageNetLatentDataset(Dataset):
    """Latent LMDB reader: keys z-{i} (float32 moments), y-{i} (int text),
    'length' (int text); optional feature LMDB join (feat-{i})."""

    def __init__(
        self,
        path: str,
        resolution: int = 32,
        num_channels: int = 4,
        split: str = "train",
        feat_path: Optional[str] = None,
        feat_dim: int = 0,
        **super_kwargs,
    ):
        from maskdit_tpu.data.native_io import open_reader

        self._path = os.path.join(path, split)
        self.feat_dim = feat_dim
        self._db = open_reader(self._path)  # C++ mmap reader when available
        self._feat_db = None
        if feat_path not in (None, "None", "") and os.path.isdir(str(feat_path)):
            assert feat_dim > 0
            self._feat_db = open_reader(os.path.join(feat_path, split))

        length = int(self._db.get(b"length").decode("utf-8"))
        raw_shape = [length, num_channels, resolution, resolution]
        super().__init__(
            name=os.path.basename(path), raw_shape=raw_shape, **super_kwargs
        )

    def _load_raw_data(self, idx: int):
        z_bytes = self._db.get(f"z-{idx}".encode())
        y_bytes = self._db.get(f"y-{idx}".encode())
        z = np.frombuffer(z_bytes, dtype=np.float32).reshape(
            [-1, self.resolution, self.resolution]
        ).copy()
        y = int(y_bytes.decode("utf-8"))
        cond = y
        if self._feat_db is not None:
            feat = np.frombuffer(
                self._feat_db.get(f"feat-{idx}".encode()), dtype=np.float32
            ).reshape([self.feat_dim]).copy()
            feat_y = int(self._feat_db.get(f"y-{idx}".encode()).decode("utf-8"))
            assert y == feat_y, "Ordering mismatch between latent and feature DBs"
            cond = [y, feat]
        return z, cond

    def close(self) -> None:
        self._db.close()
        if self._feat_db is not None:
            self._feat_db.close()


class ImageFolderDataset(Dataset):
    """Recursive dir/zip image reader returning uint8 CHW; used by FID."""

    def __init__(
        self,
        path: str,
        resolution: Optional[int] = None,
        use_labels: bool = False,
        **super_kwargs,
    ):
        self._path = path
        self._zipfile = None
        self._use_labels = use_labels
        self._raw_labels = None

        if os.path.isdir(path):
            self._type = "dir"
            self._all_fnames = {
                os.path.relpath(os.path.join(root, f), start=path)
                for root, _dirs, files in os.walk(path)
                for f in files
            }
        elif os.path.splitext(path)[1].lower() == ".zip":
            self._type = "zip"
            self._all_fnames = set(self._get_zipfile().namelist())
        else:
            raise IOError("Path must point to a directory or zip")

        exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
        self._image_fnames = sorted(
            f for f in self._all_fnames
            if os.path.splitext(f)[1].lower() in exts
        )
        if not self._image_fnames:
            raise IOError("No image files found in the specified path")

        name = os.path.splitext(os.path.basename(path))[0]
        raw_shape = [len(self._image_fnames)] + list(self._load_raw_image(0).shape)
        if resolution is not None and (
            raw_shape[2] != resolution or raw_shape[3] != resolution
        ):
            raise IOError("Image files do not match the specified resolution")
        super().__init__(name=name, raw_shape=raw_shape, **super_kwargs)

    def _get_zipfile(self):
        if self._zipfile is None:
            self._zipfile = zipfile.ZipFile(self._path)
        return self._zipfile

    def _open_file(self, fname: str):
        if self._type == "dir":
            return open(os.path.join(self._path, fname), "rb")
        return self._get_zipfile().open(fname, "r")

    def _load_raw_image(self, raw_idx: int) -> np.ndarray:
        with self._open_file(self._image_fnames[raw_idx]) as f:
            image = np.array(Image.open(f))
        if image.ndim == 2:
            image = image[:, :, np.newaxis]
        return image.transpose(2, 0, 1)  # HWC -> CHW

    def _load_raw_data(self, raw_idx: int):
        image = self._load_raw_image(raw_idx)
        assert image.dtype == np.uint8
        return image, self._get_raw_labels()[raw_idx]

    def _get_raw_labels(self) -> np.ndarray:
        if self._raw_labels is None:
            labels = self._load_raw_labels() if self._use_labels else None
            if labels is None:
                labels = np.zeros([self._raw_shape[0], 0], dtype=np.float32)
            self._raw_labels = labels
        return self._raw_labels

    def _load_raw_labels(self):
        if "dataset.json" not in self._all_fnames:
            return None
        with self._open_file("dataset.json") as f:
            labels = json.load(f)["labels"]
        if labels is None:
            return None
        labels = dict(labels)
        arr = np.array([labels[f.replace("\\", "/")] for f in self._image_fnames])
        return arr.astype({1: np.int64, 2: np.float32}[arr.ndim])

    def close(self) -> None:
        if self._zipfile is not None:
            self._zipfile.close()
            self._zipfile = None


class ImageLMDB(Dataset):
    """Raw-image LMDB reader (reference: ImageLMDB, datasets.py:95-129).

    Keys are relative file paths, values the original encoded image bytes;
    used as a fast ImageFolder cache for latent extraction. Returns
    center-cropped RGB uint8 HWC arrays + integer labels.
    """

    def __init__(self, root: str, samples: list, class_to_idx: dict,
                 resolution: int = 256, **super_kwargs):
        from maskdit_tpu.data.native_io import open_reader

        self._db = open_reader(root)
        self._samples = samples  # [(path, class_idx), ...]
        self.class_to_idx = class_to_idx
        self._res = resolution
        super().__init__(
            name=os.path.basename(root),
            raw_shape=[len(samples), 3, resolution, resolution],
            label_dim=len(class_to_idx),
            **super_kwargs,
        )

    def _load_raw_data(self, idx: int):
        path, target = self._samples[idx]
        data = self._db.get(path.encode("ascii"))
        img = Image.open(io.BytesIO(data)).convert("RGB")
        arr = np.asarray(center_crop_arr(img, self._res))
        return arr.transpose(2, 0, 1), int(target)

    def close(self) -> None:
        self._db.close()


def imagenet_lmdb_dataset(root: str, resolution: int = 256, **kwargs) -> ImageLMDB:
    """Build (or reuse) a raw-image LMDB cache for an ImageFolder tree.

    Reference: imagenet_lmdb_dataset (datasets.py:55-88) — caches every
    image file's bytes into ``<root>_faster_imagefolder.lmdb`` keyed by
    relative path, plus a JSON manifest instead of the reference's
    pickled torchvision ImageFolder.
    """
    root = root.rstrip("/")
    lmdb_path = root + "_faster_imagefolder.lmdb"
    manifest_path = root + "_faster_imagefolder.json"

    if os.path.isdir(lmdb_path) and os.path.isfile(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    else:
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        class_to_idx = {c: i for i, c in enumerate(classes)}
        samples = []
        writer = lmdb_lite.Writer(lmdb_path)
        exts = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}
        for cls in classes:
            cdir = os.path.join(root, cls)
            for fname in sorted(os.listdir(cdir)):
                if os.path.splitext(fname)[1].lower() not in exts:
                    continue
                rel = os.path.join(cls, fname)
                with open(os.path.join(cdir, fname), "rb") as f:
                    writer.put(rel.encode("ascii"), f.read())
                samples.append([rel, class_to_idx[cls]])
        writer.commit()
        manifest = {"samples": samples, "class_to_idx": class_to_idx}
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)

    return ImageLMDB(
        lmdb_path,
        [(p, t) for p, t in manifest["samples"]],
        manifest["class_to_idx"],
        resolution=resolution,
        **kwargs,
    )


class SyntheticLatentDataset(Dataset):
    """Deterministic fake moments dataset for tests and benchmarking."""

    def __init__(
        self, length: int = 256, resolution: int = 32, num_channels: int = 4,
        label_dim: int = 1000, moments: bool = True, **super_kwargs,
    ):
        self._moments = moments
        self._channels = num_channels * 2 if moments else num_channels
        super().__init__(
            name="synthetic",
            raw_shape=[length, self._channels, resolution, resolution],
            label_dim=label_dim,
            **super_kwargs,
        )

    def _load_raw_data(self, idx: int):
        rng = np.random.RandomState(idx % (1 << 31))
        z = rng.randn(self._channels, self.image_shape[1], self.image_shape[2])
        return z.astype(np.float32), int(idx % self._label_dim)


def write_latent_lmdb(
    path: str,
    moments: np.ndarray,  # (N, 2C, H, W) float32
    labels: np.ndarray,  # (N,) int
    start_idx: int = 0,
) -> None:
    """Write a latent dataset in the reference's LMDB key layout
    (extract_latent.py:58-108: z-{i} float32 bytes, y-{i} text, 'length')."""
    with lmdb_lite.Writer(path) as w:
        for i in range(len(moments)):
            idx = start_idx + i
            w.put(f"z-{idx}", moments[i].astype(np.float32).tobytes())
            w.put(f"y-{idx}", str(int(labels[i])))
        w.put("length", str(start_idx + len(moments)))
