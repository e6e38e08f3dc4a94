"""FID computation: streaming inception stats + Frechet distance.

Reference: fid.py (EDM-style): features accumulate as (sum x, sum x^T x)
so memory is O(d^2) regardless of sample count (fid.py:63-75); stats reduce
across processes (fid.py:78-79 all_reduce -> here a host-side allreduce);
FID closes with the scipy sqrtm formula (fid.py:87-91).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np
import scipy.linalg

from maskdit_tpu.data.datasets import ImageFolderDataset
from maskdit_tpu.parallel import all_reduce_sum_array, mprint


class StreamingStats:
    """Accumulate mu/sigma from feature batches (fp64 accumulators)."""

    def __init__(self, dim: int = 2048):
        self.raw_mean = np.zeros(dim, dtype=np.float64)
        self.raw_cov = np.zeros((dim, dim), dtype=np.float64)
        self.count = 0

    def update(self, features: np.ndarray) -> None:
        f = np.asarray(features, dtype=np.float64)
        self.raw_mean += f.sum(axis=0)
        self.raw_cov += f.T @ f
        self.count += f.shape[0]

    def merge_across_hosts(self) -> None:
        self.raw_mean = all_reduce_sum_array(self.raw_mean)
        self.raw_cov = all_reduce_sum_array(self.raw_cov)
        self.count = int(all_reduce_sum_array(np.asarray([self.count]))[0])

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        mu = self.raw_mean / self.count
        sigma = self.raw_cov / self.count - np.outer(mu, mu)
        return mu, sigma


def calculate_fid_from_inception_stats(
    mu: np.ndarray, sigma: np.ndarray, mu_ref: np.ndarray, sigma_ref: np.ndarray
) -> float:
    """Frechet distance (reference: fid.py:87-91)."""
    m = np.square(mu - mu_ref).sum()
    s = scipy.linalg.sqrtm(np.dot(sigma, sigma_ref))
    return float(np.real(m + np.trace(sigma + sigma_ref - s * 2)))


def calculate_inception_stats(
    image_path: str,
    detector: Callable,
    num_expected: Optional[int] = None,
    seed: int = 0,
    max_batch_size: int = 64,
    feature: str = "pool",
    rank: int = 0,
    world: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Stream a PNG folder through the detector (reference: fid.py:28-83)."""
    mprint(f'Loading images from "{image_path}"...')
    dataset = ImageFolderDataset(
        image_path, max_size=num_expected, random_seed=seed, label_dim=0
    )
    if num_expected is not None and len(dataset) < num_expected:
        raise ValueError(
            f"found {len(dataset)} images, expected at least {num_expected}"
        )
    if len(dataset) < 2:
        raise ValueError("need at least 2 images to compute statistics")

    dim = {"pool": 2048, "spatial": 2023}[feature]
    stats = StreamingStats(dim)
    indices = np.arange(len(dataset))[rank::world]
    for start in range(0, len(indices), max_batch_size):
        chunk = indices[start : start + max_batch_size]
        images = np.stack([dataset[i][0] for i in chunk])
        if images.shape[1] == 1:
            images = np.repeat(images, 3, axis=1)
        feats = detector(images)[feature]
        stats.update(np.asarray(feats))
    stats.merge_across_hosts()
    return stats.finalize()


def calc(
    image_path: str,
    ref_path: str,
    num_expected: int,
    seed: int,
    batch: int,
    detector: Callable,
    feature: str = "pool",
) -> float:
    """FID of a generated-image folder vs reference stats npz
    (reference: fid.py:96-118)."""
    with np.load(ref_path) as ref:
        mu_ref, sigma_ref = ref["mu"], ref["sigma"]
    mu, sigma = calculate_inception_stats(
        image_path, detector, num_expected, seed, batch, feature,
        rank=jax.process_index(), world=jax.process_count(),
    )
    fid = calculate_fid_from_inception_stats(mu, sigma, mu_ref, sigma_ref)
    return fid


def ref(
    dataset_path: str, dest_path: str, batch: int, detector: Callable,
    feature: str = "pool",
) -> None:
    """Compute reference stats for a dataset folder (reference: fid.py:121-134)."""
    mu, sigma = calculate_inception_stats(
        dataset_path, detector, None, 0, batch, feature,
        rank=jax.process_index(), world=jax.process_count(),
    )
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
        np.savez(dest_path, mu=mu, sigma=sigma)
        mprint(f"saved reference stats to {dest_path}")
