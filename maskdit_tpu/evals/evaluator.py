"""ADM-style second-opinion metrics: IS, sFID, precision/recall.

Re-implementation of the reference's TF1 evaluator surface
(reference: evaluator.py — IS :226-239, FID/sFID :115-163, P&R via
ManifoldEstimator/DistanceBlock :252-440) on top of our Flax Inception
features. No TF1 dependency; pairwise distances run on device.
"""

from __future__ import annotations

import struct
import zipfile
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.evals.fid import calculate_fid_from_inception_stats


def inception_score(logits: np.ndarray, split_size: int = 5000) -> float:
    """IS = exp(E_x KL(p(y|x) || p(y))), averaged over fixed-size splits
    (reference: evaluator.py:226-239 with split_size 5000)."""
    logits = np.asarray(logits, dtype=np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    for i in range(0, len(probs), split_size):
        chunk = probs[i : i + split_size]
        kl = chunk * (np.log(chunk + 1e-30) - np.log(chunk.mean(axis=0, keepdims=True) + 1e-30))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores))


def feature_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a feature set (reference: evaluator.py:221-224)."""
    f = np.asarray(feats, dtype=np.float64)
    return f.mean(axis=0), np.cov(f, rowvar=False)


def frechet_distance_from_stats(
    stats_a: tuple[np.ndarray, np.ndarray],
    stats_b: tuple[np.ndarray, np.ndarray],
) -> float:
    return calculate_fid_from_inception_stats(*stats_a, *stats_b)


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID/sFID between two raw feature sets."""
    return frechet_distance_from_stats(
        feature_stats(feats_a), feature_stats(feats_b)
    )


@jax.jit
def _pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """||a_i - b_j||^2 via the expanded form (runs on the MXU)."""
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    ab = a @ b.T
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


class ManifoldEstimator:
    """k-NN hypersphere manifold (reference: evaluator.py:252-372).

    radii[i] = distance to the k-th nearest neighbor of feature i within
    its own set (k = nhood_size, ADM default 3).
    """

    def __init__(self, features: np.ndarray, nhood_size: int = 3,
                 batch: int = 2048):
        self.features = np.asarray(features, dtype=np.float32)
        n = len(self.features)
        radii = np.zeros(n, dtype=np.float32)
        f = jnp.asarray(self.features)
        for i in range(0, n, batch):
            d = np.asarray(_pairwise_sq_dists(f[i : i + batch], f))
            # k-th NN excluding self (self-distance 0 is the 0th)
            part = np.partition(d, nhood_size, axis=1)[:, nhood_size]
            radii[i : i + batch] = part
        self.radii = radii

    def evaluate(self, queries: np.ndarray, batch: int = 2048) -> np.ndarray:
        """For each query, 1 if inside ANY sample's hypersphere."""
        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        f = jnp.asarray(self.features)
        r = jnp.asarray(self.radii)
        out = np.zeros(len(queries), dtype=np.float64)
        for i in range(0, len(queries), batch):
            d = _pairwise_sq_dists(q[i : i + batch], f)
            out[i : i + batch] = np.asarray(
                jnp.any(d <= r[None, :], axis=1)
            ).astype(np.float64)
        return out


def precision_recall(
    ref_features: np.ndarray,
    gen_features: np.ndarray,
    nhood_size: int = 3,
) -> tuple[float, float]:
    """ADM precision/recall (reference: evaluator.py:390-440)."""
    ref_manifold = ManifoldEstimator(ref_features, nhood_size)
    gen_manifold = ManifoldEstimator(gen_features, nhood_size)
    precision = float(ref_manifold.evaluate(gen_features).mean())
    recall = float(gen_manifold.evaluate(ref_features).mean())
    return precision, recall


class Evaluator:
    """All ADM metrics from a detector + two image/feature sources.

    Memory-bounded: images stream through ``features_from_batches`` in
    detector-sized minibatches (the reference evaluator streams the same
    way, evaluator.py:190-208); only the feature matrices (N x 2048 /
    2023 / 1008 float32) are held, never the image set.
    """

    def __init__(self, detector: Callable, batch: int = 64):
        self.detector = detector
        self.batch = batch

    def _detect(self, images_uint8_nchw: np.ndarray) -> dict[str, np.ndarray]:
        """One padded detector call: ragged batches are padded to the fixed
        minibatch size so XLA compiles exactly one program."""
        n = len(images_uint8_nchw)
        if images_uint8_nchw.shape[1] == 1:
            images_uint8_nchw = np.repeat(images_uint8_nchw, 3, axis=1)
        if n < self.batch:
            pad = np.zeros(
                (self.batch - n, *images_uint8_nchw.shape[1:]), dtype=np.uint8
            )
            images_uint8_nchw = np.concatenate([images_uint8_nchw, pad])
        out = self.detector(images_uint8_nchw)
        return {k: np.asarray(v[:n]) for k, v in out.items()}

    def features_from_batches(
        self, batches: Iterable[np.ndarray]
    ) -> dict[str, np.ndarray]:
        """Stream NCHW uint8 image batches -> stacked feature dict."""
        acc: dict[str, list] = {"pool": [], "spatial": [], "logits": []}
        for batch in batches:
            batch = np.asarray(batch)
            for i in range(0, len(batch), self.batch):
                out = self._detect(batch[i : i + self.batch])
                for k in acc:
                    acc[k].append(out[k])
        if not acc["pool"]:
            raise ValueError("no image batches supplied to the evaluator")
        return {k: np.concatenate(v) for k, v in acc.items()}

    def features_for(self, images_uint8_nchw: np.ndarray) -> dict[str, np.ndarray]:
        return self.features_from_batches([images_uint8_nchw])

    def compute_all(
        self,
        gen_images,
        ref_images=None,
        ref_features: Optional[dict] = None,
    ) -> dict[str, float]:
        """All metrics. ``gen_images``/``ref_images`` may be arrays or
        iterables of NCHW uint8 batches (streaming)."""
        gen = self.features_from_batches(_as_batches(gen_images))
        if ref_features is None:
            assert ref_images is not None
            ref_features = self.features_from_batches(_as_batches(ref_images))
        prec, rec = precision_recall(ref_features["pool"], gen["pool"])
        return {
            "inception_score": inception_score(gen["logits"]),
            "fid": frechet_distance(gen["pool"], ref_features["pool"]),
            "sfid": frechet_distance(gen["spatial"], ref_features["spatial"]),
            "precision": prec,
            "recall": rec,
        }


def _as_batches(images) -> Iterable[np.ndarray]:
    if isinstance(images, np.ndarray):
        return [images]
    return images


# ---------------------------------------------------------------------------
# Streaming npz ingest (bounded memory for 50K-image batch files)
# ---------------------------------------------------------------------------

def npz_array_info(path: str, key: str = "arr_0") -> tuple[tuple, np.dtype]:
    """Shape/dtype of one array in an npz without loading its data."""
    with zipfile.ZipFile(path) as zf, zf.open(_npz_member(zf, key)) as f:
        shape, _, dtype = _read_npy_header(f)
        return shape, dtype


def stream_npz_batches(
    path: str, batch_size: int, key: str = "arr_0", to_nchw: bool = True
) -> Iterator[np.ndarray]:
    """Yield row batches of npz[key] reading sequentially from the zip
    stream — peak memory is one batch, not the array (the reference
    streams the same way, evaluator.py:516-546 StreamingNpzArrayReader).

    Fortran-ordered arrays can't be row-streamed; those fall back to a
    full load.
    """
    with zipfile.ZipFile(path) as zf:
        member = _npz_member(zf, key)
        with zf.open(member) as f:
            shape, fortran, dtype = _read_npy_header(f)
            if fortran:
                arr = np.load(path)[key]
                for i in range(0, len(arr), batch_size):
                    yield _maybe_nchw(arr[i : i + batch_size], to_nchw)
                return
            row_elems = int(np.prod(shape[1:], dtype=np.int64))
            row_bytes = row_elems * dtype.itemsize
            for start in range(0, shape[0], batch_size):
                n = min(batch_size, shape[0] - start)
                data = f.read(n * row_bytes)
                if len(data) != n * row_bytes:
                    raise IOError(
                        f"truncated npy member {member!r} in {path!r}"
                    )
                batch = np.frombuffer(data, dtype=dtype).reshape(n, *shape[1:])
                yield _maybe_nchw(batch, to_nchw)


def _maybe_nchw(batch: np.ndarray, to_nchw: bool) -> np.ndarray:
    """ADM batch files are NHWC uint8; the detector wants NCHW."""
    if to_nchw and batch.ndim == 4 and batch.shape[-1] in (1, 3):
        return np.ascontiguousarray(batch.transpose(0, 3, 1, 2))
    return batch


def _npz_member(zf: zipfile.ZipFile, key: str) -> str:
    names = zf.namelist()
    want = key + ".npy"
    if want in names:
        return want
    npys = [n for n in names if n.endswith(".npy")]
    if not npys:
        raise KeyError(f"no .npy members in archive (looked for {key!r})")
    return npys[0]


def _read_npy_header(f) -> tuple[tuple, bool, np.dtype]:
    """Parse an npy stream header; returns (shape, fortran_order, dtype)."""
    magic = f.read(6)
    if magic != b"\x93NUMPY":
        raise IOError("not an npy stream")
    major, _minor = struct.unpack("BB", f.read(2))
    if major == 1:
        (hlen,) = struct.unpack("<H", f.read(2))
    else:
        (hlen,) = struct.unpack("<I", f.read(4))
    import ast

    header = ast.literal_eval(f.read(hlen).decode("latin1"))
    return (
        tuple(header["shape"]),
        bool(header["fortran_order"]),
        np.dtype(header["descr"]),
    )


def stream_folder_batches(
    folder: str, batch_size: int, max_images: Optional[int] = None
) -> Iterator[np.ndarray]:
    """Yield NCHW uint8 batches from a PNG directory (streaming analogue of
    the reference's all-in-RAM png2npz ingest, evaluator.py:54-67)."""
    from maskdit_tpu.data.datasets import ImageFolderDataset

    ds = ImageFolderDataset(folder, max_size=max_images, label_dim=0)
    try:
        for start in range(0, len(ds), batch_size):
            yield np.stack(
                [ds[i][0] for i in range(start, min(start + batch_size, len(ds)))]
            )
    finally:
        ds.close()


def npz_has_key(path: str, key: str) -> bool:
    with zipfile.ZipFile(path) as zf:
        return key + ".npy" in zf.namelist()


def png_folder_to_npz(folder: str, out_path: str, max_images: Optional[int] = None) -> None:
    """PNG dir -> npz batch file (reference: evaluator.py:54-67 ingest)."""
    from maskdit_tpu.data.datasets import ImageFolderDataset

    ds = ImageFolderDataset(folder, max_size=max_images, label_dim=0)
    arr = np.stack([ds[i][0].transpose(1, 2, 0) for i in range(len(ds))])
    np.savez(out_path, arr_0=arr)
