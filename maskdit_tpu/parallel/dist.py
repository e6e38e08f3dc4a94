"""Multi-host runtime utilities.

Replaces the reference's NCCL process-group layer (reference: utils.py:84-112
init_processes/mprint/cleanup; train.py:245 all_reduce; train.py:271
barrier). On TPU, cross-host collectives are emitted by XLA from shardings;
the only explicit runtime pieces needed are process bootstrap, host
barriers, and rank-0 gating.
"""

from __future__ import annotations

import builtins
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for multi-host meshes.

    On TPU pods the environment auto-configures; args are for manual setups
    (the analogue of the reference's MASTER_ADDR/PORT env init,
    utils.py:86-91). Safe to call when single-process.

    Ordering matters: ``jax.distributed.initialize`` must run before ANY
    call that instantiates the backend (including innocuous-looking ones
    like ``jax.process_count()``), so this function decides purely from its
    arguments and the distributed client state — it never touches a
    backend-creating jax API before initialize().
    """
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run: nothing to do
    # Already bootstrapped (e.g. called twice, or auto-init on a pod)?
    # is_initialized() reads plain client state — it does not create a
    # backend, unlike jax.process_count().
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def mprint(*args: Any, **kwargs: Any) -> None:
    """Print from process 0 only (reference: utils.py:97-102)."""
    if is_main_process():
        builtins.print(*args, **kwargs)


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (reference: dist.barrier at train.py:271).

    No-op single-process; otherwise a tiny all-reduce over hosts.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_reduce_sum_array(value: np.ndarray) -> np.ndarray:
    """Sum a host-local numpy array across processes (reference:
    dist.all_reduce at fid.py:78-79). Identity when single-process."""
    if jax.process_count() == 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(value))
    return np.asarray(gathered).sum(axis=0)


def all_reduce_mean_scalar(value: float | np.ndarray) -> float:
    """Average a host-local python scalar across processes.

    Mirrors the loss-logging all-reduce (reference: train.py:245-247).
    """
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = jnp.asarray([float(value)], dtype=jnp.float32)
    summed = multihost_utils.process_allgather(arr)
    return float(np.mean(summed))
