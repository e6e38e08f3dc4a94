"""Feature-LMDB retrieval for external-feature conditioning.

Reference: retrieve_n_features (sample.py:192-227): draw (feature, label)
rows from a feature LMDB (keys feat-{i} float32, y-{i} int text) in one of
three modes — rand_full (iid rows), rand_repeat (one row repeated),
rand_y (one feature, random labels). Used when the model is built with
ext_feature_dim > 0.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

from maskdit_tpu.data.native_io import open_reader


def retrieve_n_features(
    batch_size: int,
    feat_path: str,
    feat_dim: int,
    num_classes: int,
    split: str = "train",
    sample_mode: str = "rand_full",
    seed: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (features (B, feat_dim) float32, one-hot labels (B, K))."""
    rng = random.Random(seed)
    db = open_reader(os.path.join(feat_path, split))
    try:
        length = int(db.get(b"length").decode("utf-8"))
        pool = length // 2
        if sample_mode == "rand_full":
            ids = rng.sample(range(pool), batch_size)
            ids_y = ids
        elif sample_mode == "rand_repeat":
            ids = rng.sample(range(pool), 1) * batch_size
            ids_y = ids
        elif sample_mode == "rand_y":
            ids = rng.sample(range(pool), 1) * batch_size
            ids_y = rng.sample(range(pool), batch_size)
        else:
            raise NotImplementedError(f"sample_mode '{sample_mode}'")

        features, labels = [], []
        for i, iy in zip(ids, ids_y):
            feat = np.frombuffer(
                db.get(f"feat-{i}".encode()), dtype=np.float32
            ).reshape([feat_dim]).copy()
            labels.append(int(db.get(f"y-{iy}".encode()).decode("utf-8")))
            features.append(feat)
        features_np = np.stack(features)
        onehot = np.zeros((batch_size, num_classes), dtype=np.float32)
        if num_classes > 0:
            onehot[np.arange(batch_size), np.asarray(labels)] = 1.0
        return features_np, onehot
    finally:
        db.close()
