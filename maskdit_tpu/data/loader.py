"""Host-side data loading: shuffling, batching, prefetch, device placement.

Replaces the reference's torch DataLoader + pin_memory + Accelerate device
moves (reference: train.py:110-117, train_wds.py:172-178). Design:

  * each host reads a disjoint, rank-strided slice of the sample index
    space (the analogue of the WDS nodesplitter, train_wds.py:35-42);
  * worker *threads* decode samples (loads here are numpy slicing /
    LMDB reads, which release the GIL in mmap/IO);
  * batches are assembled as numpy and turned into globally-sharded jax
    arrays with ``make_array_from_process_local_data`` so the jitted train
    step consumes them with zero host-side reshards;
  * a small prefetch queue overlaps host IO with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax
import numpy as np

from maskdit_tpu.data.datasets import Dataset


class DataLoader:
    """Epoch-based shuffled loader over a map-style Dataset.

    Yields dicts {'x': (B, C, H, W) float32, 'y': (B, K) float32} with B =
    per-host batch size. Infinite iteration (epochs roll over) to match the
    reference's epoch loop semantics with deterministic per-epoch shuffles.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        resample: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.resample = resample  # iid with replacement (reference
        # train_wds.py --resample / resampled shards)
        self.rank = (
            process_index if process_index is not None else jax.process_index()
        )
        self.world = (
            process_count if process_count is not None else jax.process_count()
        )

    def epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.RandomState((self.seed + epoch) % (1 << 31))
        if self.resample:
            # iid with replacement; disjoint per rank by striding the draw
            idx = rng.randint(0, n, size=n)
        else:
            idx = np.arange(n)
            if self.shuffle:
                rng.shuffle(idx)
        # rank-strided split (reference: sample.py:235, train_wds.py:35-42)
        return idx[self.rank :: self.world]

    def _load_one(self, i: int):
        return self.dataset[int(i)]

    def batches(self, epoch: int) -> Iterator[dict[str, np.ndarray]]:
        idx = self.epoch_indices(epoch)
        n_batches = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            n_batches += 1
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            # No `with`: joining worker threads from a generator finalized
            # at interpreter shutdown raises inside threading internals.
            # wait=False lets Python's own atexit hook reap the threads.
            pool = ThreadPoolExecutor(self.num_workers)
            try:
                for b in range(n_batches):
                    chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    samples = list(pool.map(self._load_one, chunk))
                    yield self._collate(samples)
            finally:
                pool.shutdown(wait=False, cancel_futures=True)
        else:
            for b in range(n_batches):
                chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                yield self._collate([self._load_one(i) for i in chunk])

    @staticmethod
    def _collate(samples) -> dict[str, np.ndarray]:
        xs, conds = zip(*samples)
        batch = {"x": np.stack(xs).astype(np.float32)}
        if isinstance(conds[0], list):  # [onehot, feat]
            batch["y"] = np.stack([c[0] for c in conds]).astype(np.float32)
            batch["feat"] = np.stack([c[1] for c in conds]).astype(np.float32)
        else:
            batch["y"] = np.stack(conds).astype(np.float32)
        return batch

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        # fail fast instead of spinning through empty epochs forever: with
        # drop_last, a per-rank slice smaller than one batch yields ZERO
        # batches per epoch and this loop would silently hang the trainer
        # (found by tools/overfit_gate.py with an 8-record dataset)
        per_rank = len(self.epoch_indices(0))
        if self.drop_last and per_rank < self.batch_size:
            raise ValueError(
                f"dataset yields {per_rank} samples/rank/epoch < batch_size "
                f"{self.batch_size}: no full batch would ever be produced "
                "(shrink the batch or grow/replicate the dataset)"
            )
        epoch = 0
        while True:
            yield from self.batches(epoch)
            epoch += 1


def shard_batch(batch: dict[str, np.ndarray], sharding: Any) -> dict[str, jax.Array]:
    """Host-local numpy batch -> globally sharded jax arrays.

    Single-process: device_put with the sharding. Multi-host: the local
    batch is this host's shard of the global batch.
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def prefetch(
    iterator: Iterator[dict[str, np.ndarray]],
    sharding: Any,
    size: int = 2,
) -> Iterator[dict[str, jax.Array]]:
    """Background-thread prefetch: shard + enqueue up to ``size`` batches."""
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = object()
    error: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(shard_batch(item, sharding))
        except BaseException as e:  # surface loader errors to the consumer
            error.append(e)
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            if error:
                raise error[0]
            return
        yield item
