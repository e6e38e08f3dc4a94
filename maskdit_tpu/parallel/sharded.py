"""Sharded training setup: state creation and the pjit-ed train step.

This is the TPU counterpart of the reference's `accelerator.prepare(model,
optimizer, loader)` + DDP wrap (reference: train.py:178): parameters are
materialized *directly into their shards* (no host-side full copy), and the
train step is jitted with NamedShardings so XLA emits all gradient
reductions/parameter gathers as ICI collectives.

The partition rules live in maskdit_tpu.parallel.mesh. Because rules are
suffix-matched on tree paths, the same rule set shards params, EMA params,
and the Adam mu/nu accumulators consistently.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from jax.sharding import Mesh

from maskdit_tpu.models.precond import EDMPrecond
from maskdit_tpu.parallel import mesh as mesh_lib
from maskdit_tpu.train.state import TrainState, create_train_state, make_train_step


def state_shardings(
    state_shapes: Any, mesh: Mesh, rules: Optional[list] = None
) -> Any:
    """NamedSharding tree for a TrainState (or its eval_shape)."""
    specs = mesh_lib.param_specs(state_shapes, rules)
    return mesh_lib.shardings_for(state_shapes, specs, mesh)


def create_sharded_state(
    model: EDMPrecond,
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int = 1,
    mask_ratio: float = 0.5,
    rules: Optional[list] = None,
) -> tuple[TrainState, Any]:
    """Initialize a TrainState with every leaf placed on its shards.

    Returns (state, shardings). Uses eval_shape to plan shardings, then a
    jitted init with out_shardings so large params never exist unsharded.
    """
    init_fn = lambda r: create_train_state(
        model, r, optimizer, batch_size=batch_size, mask_ratio=mask_ratio
    )
    shapes = jax.eval_shape(init_fn, rng)
    shardings = state_shardings(shapes, mesh, rules)
    state = jax.jit(init_fn, out_shardings=shardings)(rng)
    return state, shardings


def make_sharded_train_step(
    model: EDMPrecond,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    shardings: Any,
    donate: bool = True,
    **step_kwargs: Any,
) -> Callable:
    """jit the train step with explicit input/output shardings.

    batch enters sharded over the data-like axes; metrics leave replicated.
    """
    if (
        "microbatch_sharding" not in step_kwargs
        and step_kwargs.get("grad_accum", 1) > 1
    ):
        data_like = int(mesh.shape.get("data", 1)) * int(
            mesh.shape.get("fsdp", 1)
        )
        if data_like > 1:
            # keep each accumulation micro-batch sharded over the
            # data-like axes ((grad_accum, micro, ...) leaves, batch on
            # dim 1) — see the state.py constraint comment for why
            from jax.sharding import NamedSharding

            step_kwargs["microbatch_sharding"] = NamedSharding(
                mesh, mesh_lib.P(None, ("data", "fsdp"))
            )
    step = make_train_step(model, optimizer, **step_kwargs)
    # inputs arrive pre-sharded (state from create_sharded_state, batches
    # from data.loader.prefetch), so only outputs are constrained — this
    # also keeps the batch pytree structure flexible (optional 'feat').
    return jax.jit(
        step,
        out_shardings=(shardings, None),
        donate_argnums=(0,) if donate else (),
    )
