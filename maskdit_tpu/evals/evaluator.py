"""ADM-style second-opinion metrics: IS, sFID, precision/recall.

Re-implementation of the reference's TF1 evaluator surface
(reference: evaluator.py — IS :226-239, FID/sFID :115-163, P&R via
ManifoldEstimator/DistanceBlock :252-440) on top of our Flax Inception
features. No TF1 dependency; pairwise distances run on device.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.evals.fid import calculate_fid_from_inception_stats


def inception_score(logits: np.ndarray, splits: int = 1) -> float:
    """IS = exp(E_x KL(p(y|x) || p(y))) (reference: evaluator.py:226-239)."""
    logits = np.asarray(logits, dtype=np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    for chunk in np.array_split(probs, splits):
        kl = chunk * (np.log(chunk + 1e-30) - np.log(chunk.mean(axis=0, keepdims=True) + 1e-30))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores))


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID/sFID between two raw feature sets."""
    def stats(f):
        f = np.asarray(f, dtype=np.float64)
        mu = f.mean(axis=0)
        sigma = np.cov(f, rowvar=False)
        return mu, sigma

    mu_a, sig_a = stats(feats_a)
    mu_b, sig_b = stats(feats_b)
    return calculate_fid_from_inception_stats(mu_a, sig_a, mu_b, sig_b)


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
    """All ADM metrics from a detector + two image/feature sources."""

    def __init__(self, detector: Callable, batch: int = 64):
        self.detector = detector
        self.batch = batch

    def features_for(self, images_uint8_nchw: np.ndarray) -> dict[str, np.ndarray]:
        pools, spatials, logits = [], [], []
        for i in range(0, len(images_uint8_nchw), self.batch):
            out = self.detector(images_uint8_nchw[i : i + self.batch])
            pools.append(np.asarray(out["pool"]))
            spatials.append(np.asarray(out["spatial"]))
            logits.append(np.asarray(out["logits"]))
        return {
            "pool": np.concatenate(pools),
            "spatial": np.concatenate(spatials),
            "logits": np.concatenate(logits),
        }

    def compute_all(
        self,
        gen_images: np.ndarray,
        ref_images: Optional[np.ndarray] = None,
        ref_features: Optional[dict] = None,
    ) -> dict[str, float]:
        gen = self.features_for(gen_images)
        if ref_features is None:
            assert ref_images is not None
            ref_features = self.features_for(ref_images)
        prec, rec = precision_recall(ref_features["pool"], gen["pool"])
        return {
            "inception_score": inception_score(gen["logits"]),
            "fid": frechet_distance(gen["pool"], ref_features["pool"]),
            "sfid": frechet_distance(gen["spatial"], ref_features["spatial"]),
            "precision": prec,
            "recall": rec,
        }


def png_folder_to_npz(folder: str, out_path: str, max_images: Optional[int] = None) -> None:
    """PNG dir -> npz batch file (reference: evaluator.py:54-67 ingest)."""
    from maskdit_tpu.data.datasets import ImageFolderDataset

    ds = ImageFolderDataset(folder, max_size=max_images, label_dim=0)
    arr = np.stack([ds[i][0].transpose(1, 2, 0) for i in range(len(ds))])
    np.savez(out_path, arr_0=arr)
