"""Dataset classes (numpy-native, torch-free).

Provides the same capabilities as the reference's train_utils/datasets.py
(cited by line below) with an original decomposition:

  * ``Dataset``: a thin map-style base. View bookkeeping (random subset via
    ``max_size``, epoch doubling via ``xflip``) lives in the standalone
    :func:`plan_view`, label encoding in :func:`encode_label`; subclasses
    implement a single ``fetch(record_id)`` hook.
  * ``ImageNetLatentDataset``: latent LMDB reader with optional feature
    LMDB join (same key schema as reference datasets.py:240-304) — backed
    by lmdb_lite.
  * ``ImageFolderDataset``: recursive dir/zip image reader used by FID
    (same capability as reference datasets.py:310-410). File access goes
    through a small source protocol (``_DirSource`` / ``_ZipSource``)
    instead of type branching.
  * ``center_crop_arr``: ADM center-crop (reference: datasets.py:19-37).
  * ``SyntheticLatentDataset``: deterministic fake latents for tests/bench
    (no reference counterpart — the reference has no test data path).

Flip convention: the latent pipeline materialises horizontally-flipped
copies at extraction time as records [N, 2N) (extract_latent.py), so
``xflip`` there means "include the stored flipped half". Image datasets
have no stored copies, so they flip the decoded array at load time. The
``flips`` class attribute ("stored" / "decode") selects the behavior.
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

IMAGE_EXTENSIONS = frozenset({".png", ".jpg", ".jpeg", ".bmp", ".webp"})


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


def plan_view(
    num_records: int,
    max_size: Optional[int] = None,
    xflip: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """Build the view->record index map for a dataset of ``num_records``.

    ``max_size`` keeps a seeded random subset (in ascending record order so
    sequential reads stay sequential); ``xflip`` then appends a second pass
    over the same subset, encoded as ``record_id + num_records``. Callers
    decode ids >= num_records as "the flipped variant of id - num_records".
    """
    ids = np.arange(num_records, dtype=np.int64)
    if max_size is not None and max_size < num_records:
        keep = np.random.RandomState(seed % (1 << 31)).permutation(num_records)
        ids = np.sort(ids[keep[:max_size]])
    if xflip:
        ids = np.concatenate([ids, ids + num_records])
    return ids


def encode_label(label, label_dim: int) -> np.ndarray:
    """Normalize a per-record label to the float32 array the model consumes.

    Integer class ids become one-hot vectors of length ``label_dim``;
    ``None`` becomes the empty (label_dim == 0) or zero vector; float
    arrays (precomputed embeddings / one-hots) pass through as float32.
    """
    if label is None:
        return np.zeros((label_dim,), dtype=np.float32)
    if isinstance(label, (int, np.integer)) or (
        isinstance(label, np.ndarray) and np.issubdtype(label.dtype, np.integer)
    ):
        vec = np.zeros((label_dim,), dtype=np.float32)
        vec[int(label)] = 1.0
        return vec
    return np.asarray(label, dtype=np.float32).copy()


class Dataset:
    """Map-style dataset base.

    Subclasses call ``_init_view`` once with the stored record count and
    per-sample array shape, then implement ``fetch(record_id)`` returning
    ``(array, label)`` — where ``label`` is an int class id, a float
    vector, ``None``, or an ``[label, feature]`` pair for the feature-
    conditioned path. ``__getitem__`` resolves the subset/xflip view and
    encodes labels; datasets whose flips are not materialised in storage
    set ``flips = "decode"`` to get load-time flipping instead.
    """

    flips = "stored"

    def _init_view(
        self,
        name: str,
        num_records: int,
        sample_shape: Sequence[int],
        label_dim: int = 1000,
        max_size: Optional[int] = None,
        xflip: bool = False,
        random_seed: int = 0,
    ) -> None:
        self._name = name
        self._num_records = int(num_records)
        self._sample_shape = tuple(int(s) for s in sample_shape)
        self._label_dim = int(label_dim)
        self._view = plan_view(self._num_records, max_size, xflip, random_seed)

    def fetch(self, record_id: int):
        raise NotImplementedError  # subclass hook

    def close(self) -> None:
        pass

    def __len__(self) -> int:
        return len(self._view)

    def __getitem__(self, idx: int):
        record_id = int(self._view[idx])
        flipped = False
        if record_id >= self._num_records and self.flips == "decode":
            record_id -= self._num_records
            flipped = True
        array, label = self.fetch(record_id)
        array = np.ascontiguousarray(array[..., ::-1] if flipped else array)
        if isinstance(label, list):  # [label, feature] join
            return array, [encode_label(label[0], self._label_dim), *label[1:]]
        return array, encode_label(label, self._label_dim)

    # -- shape/metadata accessors ------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def image_shape(self) -> list:
        return list(self._sample_shape)

    @property
    def num_channels(self) -> int:
        return self._sample_shape[0]

    @property
    def resolution(self) -> int:
        c, h, w = self._sample_shape
        assert h == w, f"non-square samples: {self._sample_shape}"
        return h

    @property
    def label_shape(self) -> list:
        return [self._label_dim]

    @property
    def label_dim(self) -> int:
        return self._label_dim


class ImageNetLatentDataset(Dataset):
    """Latent LMDB reader: keys z-{i} (float32 moments), y-{i} (int text),
    'length' (int text); optional feature LMDB join (feat-{i}).

    Same key schema as the reference reader (datasets.py:240-304) so
    extracted datasets are interchangeable. Flipped copies are stored
    (extract_latent's --xflip appends them as records [N, 2N)).
    """

    flips = "stored"

    def __init__(
        self,
        path: str,
        resolution: int = 32,
        num_channels: int = 4,
        split: str = "train",
        feat_path: Optional[str] = None,
        feat_dim: int = 0,
        **view_kwargs,
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
        self._init_view(
            name=os.path.basename(path),
            num_records=length,
            sample_shape=(num_channels, resolution, resolution),
            **view_kwargs,
        )

    def fetch(self, record_id: int):
        z = np.frombuffer(
            self._db.get(f"z-{record_id}".encode()), dtype=np.float32
        ).reshape([-1, self.resolution, self.resolution]).copy()
        y = int(self._db.get(f"y-{record_id}".encode()).decode("utf-8"))
        if self._feat_db is None:
            return z, y
        feat = np.frombuffer(
            self._feat_db.get(f"feat-{record_id}".encode()), dtype=np.float32
        ).reshape([self.feat_dim]).copy()
        feat_y = int(self._feat_db.get(f"y-{record_id}".encode()).decode("utf-8"))
        assert y == feat_y, "Ordering mismatch between latent and feature DBs"
        return z, [y, feat]

    def close(self) -> None:
        self._db.close()
        if self._feat_db is not None:
            self._feat_db.close()


# ---------------------------------------------------------------------------
# Folder / zip image sources
# ---------------------------------------------------------------------------

class _DirSource:
    """Recursive directory listing with relative-path access."""

    def __init__(self, path: str):
        self._root = path
        found = []
        for base, _dirs, files in os.walk(path):
            rel_base = os.path.relpath(base, path)
            for f in files:
                found.append(
                    f if rel_base == "." else os.path.join(rel_base, f)
                )
        self.names = sorted(n.replace(os.sep, "/") for n in found)

    def read(self, name: str) -> bytes:
        with open(os.path.join(self._root, name), "rb") as f:
            return f.read()

    def close(self) -> None:
        pass


class _ZipSource:
    """Zip-archive listing with member access (lazily opened)."""

    def __init__(self, path: str):
        self._path = path
        self._zf: Optional[zipfile.ZipFile] = None
        self.names = sorted(
            info.filename for info in zipfile.ZipFile(path).infolist()
            if not info.is_dir()
        )

    def read(self, name: str) -> bytes:
        if self._zf is None:
            self._zf = zipfile.ZipFile(self._path)
        return self._zf.read(name)

    def close(self) -> None:
        if self._zf is not None:
            self._zf.close()
            self._zf = None


def _decode_image_chw(data: bytes) -> np.ndarray:
    """Decode image bytes to a uint8 CHW array (grayscale gets 1 channel)."""
    arr = np.asarray(Image.open(io.BytesIO(data)))
    if arr.ndim == 2:
        arr = arr[None, :, :]
    else:
        arr = arr.transpose(2, 0, 1)
    return arr


class ImageFolderDataset(Dataset):
    """Images from a directory tree or zip archive, as uint8 CHW; the FID
    ingestion path (same capability as reference datasets.py:310-410).

    Optional labels come from a ``dataset.json`` member with
    ``{"labels": [[relative_name, class_or_vector], ...]}``.
    """

    flips = "decode"

    def __init__(
        self,
        path: str,
        resolution: Optional[int] = None,
        use_labels: bool = False,
        **view_kwargs,
    ):
        if os.path.isdir(path):
            self._source = _DirSource(path)
        elif zipfile.is_zipfile(path):
            self._source = _ZipSource(path)
        else:
            raise IOError(
                f"image dataset path is neither a directory nor a zip "
                f"archive: {path!r}"
            )

        self._files = [
            n for n in self._source.names
            if os.path.splitext(n)[1].lower() in IMAGE_EXTENSIONS
        ]
        if not self._files:
            raise IOError(f"no decodable image files under {path!r}")

        self._labels = (
            self._read_label_table() if use_labels else None
        )

        probe = _decode_image_chw(self._source.read(self._files[0]))
        if resolution is not None and probe.shape[1:] != (resolution, resolution):
            raise IOError(
                f"dataset images are {probe.shape[1]}x{probe.shape[2]}, "
                f"but resolution={resolution} was requested"
            )
        label_dim = view_kwargs.pop("label_dim", 0 if self._labels is None else 1000)
        self._init_view(
            name=os.path.splitext(os.path.basename(path))[0],
            num_records=len(self._files),
            sample_shape=probe.shape,
            label_dim=label_dim,
            **view_kwargs,
        )

    def _read_label_table(self) -> Optional[dict]:
        if "dataset.json" not in self._source.names:
            return None
        table = json.loads(self._source.read("dataset.json")).get("labels")
        if table is None:
            return None
        return {name: value for name, value in table}

    def fetch(self, record_id: int):
        name = self._files[record_id]
        image = _decode_image_chw(self._source.read(name))
        if image.dtype != np.uint8:
            raise ValueError(f"expected 8-bit image data in {name!r}")
        label = None
        if self._labels is not None:
            label = self._labels[name]
            if isinstance(label, list):
                label = np.asarray(label, dtype=np.float32)
        return image, label

    def close(self) -> None:
        self._source.close()


class ImageLMDB(Dataset):
    """Raw-image LMDB reader (reference: ImageLMDB, datasets.py:95-129).

    Keys are relative file paths, values the original encoded image bytes;
    used as a fast ImageFolder cache for latent extraction. Returns
    center-cropped RGB uint8 HWC arrays + integer labels.
    """

    flips = "decode"

    def __init__(self, root: str, samples: list, class_to_idx: dict,
                 resolution: int = 256, **view_kwargs):
        from maskdit_tpu.data.native_io import open_reader

        self._db = open_reader(root)
        self._samples = samples  # [(path, class_idx), ...]
        self.class_to_idx = class_to_idx
        self._res = resolution
        self._init_view(
            name=os.path.basename(root),
            num_records=len(samples),
            sample_shape=(3, resolution, resolution),
            label_dim=len(class_to_idx),
            **view_kwargs,
        )

    def fetch(self, record_id: int):
        path, target = self._samples[record_id]
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
        for cls in classes:
            cdir = os.path.join(root, cls)
            for fname in sorted(os.listdir(cdir)):
                if os.path.splitext(fname)[1].lower() not in IMAGE_EXTENSIONS:
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
        label_dim: int = 1000, moments: bool = True, **view_kwargs,
    ):
        self._moments = moments
        self._channels = num_channels * 2 if moments else num_channels
        self._label_classes = label_dim
        self._init_view(
            name="synthetic",
            num_records=length,
            sample_shape=(self._channels, resolution, resolution),
            label_dim=label_dim,
            **view_kwargs,
        )

    def fetch(self, record_id: int):
        rng = np.random.RandomState(record_id % (1 << 31))
        z = rng.randn(self._channels, self.image_shape[1], self.image_shape[2])
        return z.astype(np.float32), int(record_id % max(self._label_classes, 1))


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
