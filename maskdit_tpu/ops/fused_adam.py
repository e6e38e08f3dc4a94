"""Single-pass fused Adam + EMA update (Pallas).

The reference leans on apex ``FusedAdam`` (train.py:141) plus a separate
Python EMA pass (helper.py:48-58). On TPU the optimizer tail is pure HBM
bandwidth: for XL/2 (675M fp32 params) one Adam pass moves ~19 GB and the
EMA pass another ~8 GB. XLA schedules optax's update as several loops
(measured 65 ms/step on v5e r1); this kernel does

    m   <- b1*m + (1-b1)*g
    v   <- b2*v + (1-b2)*g^2
    p   <- p - lr * (m/bc1) / (sqrt(v/bc2) + eps)
    ema <- d*ema + (1-d)*p

in ONE read-modify-write sweep per leaf: 5 reads + 4 writes = 9 passes
over the params (~24 GB, ~30 ms at 819 GB/s v5e HBM), with outputs
aliased onto inputs so no extra buffers exist.

Math matches optax.scale_by_adam (bias-corrected, eps outside the sqrt)
== torch/apex Adam, so the optax ``ScaleByAdamState`` checkpoints stay
valid; :class:`FusedAdamEma` reads and writes that exact state tree.

Leaves smaller than one tile row or not 128-divisible fall back to the
identical jnp math (XLA fuses those fine; they are <0.1% of the bytes).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANES = 128
# 512x128 fp32 = 256 KB/buffer; 9 buffers ~2.3 MB VMEM (double-buffered ~4.6)
BLOCK_ROWS = int(os.environ.get("MASKDIT_FUSED_ADAM_BLOCK_ROWS", "512"))


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """fp32 -> bf16 with stochastic rounding (unbiased narrow storage).

    Adds uniform random bits to the 16 low mantissa bits of the fp32
    representation and truncates: each value rounds up with probability
    equal to its fractional distance between the two bracketing bf16
    values, so E[SR(x)] == x. This is what makes a *narrow-stored* EMA
    with per-step relative increments BELOW the storage resolution
    track its fp32 reference in expectation — plain round-to-nearest
    freezes such an accumulator (the update rounds back to the old
    value every step, a systematic bias).

    Used for Adam's second moment (increment (1-b2) = 0.1% vs bf16's
    ~0.4% resolution). The first moment (increment 10%) does not need
    it, and the model EMA (increment 1e-4) must NOT use it: SR noise is
    re-injected into the stored value every step, and an EMA with decay
    d accumulates it to a stationary std of ulp/sqrt(12*(1-d^2)) —
    ~2.5% relative for nu at b2=0.999 (benign under the sqrt, bounded
    by tests/test_fused_adam.py::test_bf16_nu_sr_tracks_fp32) but ~8%
    for the model EMA at 0.9999 (ruinous). nu-only, by design.
    """
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    u = (u + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16
    )


def _adam_ema_kernel(b1, b2, eps, with_ema,
                     s_ref, g_ref, p_ref, m_ref, v_ref, e_ref,
                     p_out, m_out, v_out, e_out):
    lr = s_ref[0, 0]
    bc1 = s_ref[0, 1]  # 1 - b1^t
    bc2 = s_ref[0, 2]  # 1 - b2^t
    d = s_ref[0, 3]  # ema decay
    g = g_ref[:]
    # moments may be stored in a narrower dtype (mu_dtype); math is fp32
    m = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
    denom = jnp.sqrt(v / bc2) + eps
    p = p_ref[:] - lr * (m / bc1) / denom
    p_out[:] = p
    m_out[:] = m.astype(m_out.dtype)
    v_out[:] = v.astype(v_out.dtype)
    if with_ema:
        e_out[:] = d * e_ref[:] + (1.0 - d) * p
    else:
        e_out[:] = e_ref[:]


def _leaf_update_pallas(scalars, g, p, m, v, e, *, b1, b2, eps, with_ema,
                        interpret):
    """One leaf, reshaped (rows, 128), gridded over row blocks."""
    orig_shape = p.shape
    rows = p.size // LANES
    as2d = lambda a: a.reshape(rows, LANES)
    g = g.astype(jnp.float32)  # AMP-style bf16 grads upcast at the boundary
    g2, p2, m2, v2, e2 = map(as2d, (g, p, m, v, e))
    grid = (pl.cdiv(rows, BLOCK_ROWS),)
    tile = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)
    kernel = functools.partial(_adam_ema_kernel, b1, b2, eps, with_ema)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, tile, tile, tile, tile, tile],
        out_specs=(tile, tile, tile, tile),
        # outputs keep each state buffer's own dtype (moments may be
        # stored narrower via mu_dtype; aliasing requires the match)
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), a.dtype)
            for a in (p2, m2, v2, e2)
        ),
        # in-place: p, m, v, ema buffers are reused for the outputs
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,
    )(scalars, g2, p2, m2, v2, e2)
    new_p, new_m, new_v, new_e = (a.reshape(orig_shape) for a in out)
    return new_p, new_m, new_v, new_e


def _leaf_update_jnp(scalars, g, p, m, v, e, *, b1, b2, eps, with_ema,
                     nu_key=None):
    """Fallback for tiny/ragged leaves — same math, plain XLA.

    ``nu_key`` (required when v is stored narrower than fp32): PRNG key
    for stochastically rounding the updated second moment back into its
    storage dtype — see :func:`stochastic_round_bf16` for why
    round-to-nearest is wrong there.
    """
    lr, bc1, bc2, d = (scalars[0, i] for i in range(4))
    g = g.astype(jnp.float32)
    m_new = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
    v_new = b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g
    p = p - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    e = d * e + (1.0 - d) * p if with_ema else e
    if v.dtype == jnp.float32:
        v_store = v_new
    elif nu_key is not None:
        v_store = stochastic_round_bf16(v_new, nu_key)
    else:
        raise ValueError(
            "narrow nu storage requires stochastic rounding (nu_key); "
            "round-to-nearest freezes the moment at (1-b2) increments"
        )
    return p, m_new.astype(m.dtype), v_store, e


def fused_adam_ema(
    grads: Any,
    params: Any,
    mu: Any,
    nu: Any,
    ema: Any,
    *,
    lr: jax.Array,
    count_inc: jax.Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    ema_decay: Union[float, jax.Array] = 0.9999,
    with_ema: bool = True,
    mode: Optional[str] = None,  # 'pallas' | 'jnp' | 'interpret' | None=auto
    nu_sr_key: Optional[jax.Array] = None,  # required when nu is stored bf16
) -> tuple[Any, Any, Any, Any]:
    """Apply the fused update across a pytree.

    Returns (new_params, new_mu, new_nu, new_ema). ``count_inc`` is the
    post-increment step (optax convention for bias correction).

    mode: 'pallas' = the single-sweep kernel; 'jnp' = the same math as one
    jnp expression per leaf (XLA-fused; correct everywhere); 'interpret' =
    the Pallas kernel under the interpreter (tests exercise kernel
    semantics on CPU). auto = 'jnp': measured on v5e r2, XLA already
    streams this update at ~596 GB/s while the per-leaf Pallas kernel
    reached only ~492 GB/s plus ~0.2 ms/call dispatch overhead (ruinous at
    ~600 leaves) and broke donation aliasing (bs48/64 OOM). Keep 'pallas'
    opt-in until it beats that bar.
    """
    if mode is None:
        mode = "jnp"
    interpret = mode == "interpret"

    t = count_inc.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** t,
        1.0 - jnp.asarray(b2, jnp.float32) ** t,
        jnp.asarray(ema_decay, jnp.float32),
    ]).reshape(1, 4)

    def leaf(i, g, p, m, v, e):
        narrow_nu = v.dtype != jnp.float32
        nu_key = (
            jax.random.fold_in(nu_sr_key, i)
            if (narrow_nu and nu_sr_key is not None) else None
        )
        # the Pallas kernel writes v with round-to-nearest, which is the
        # wrong rounding for narrow nu storage — route those leaves jnp
        if (not narrow_nu and mode != "jnp"
                and p.size >= LANES and p.size % LANES == 0):
            return _leaf_update_pallas(
                scalars, g, p, m, v, e,
                b1=b1, b2=b2, eps=eps, with_ema=with_ema,
                interpret=interpret,
            )
        return _leaf_update_jnp(
            scalars, g, p, m, v, e, b1=b1, b2=b2, eps=eps, with_ema=with_ema,
            nu_key=nu_key,
        )

    flat_g, treedef = jax.tree_util.tree_flatten(grads)
    flat_p = treedef.flatten_up_to(params)
    flat_m = treedef.flatten_up_to(mu)
    flat_v = treedef.flatten_up_to(nu)
    flat_e = treedef.flatten_up_to(ema)
    outs = [
        leaf(i, *args)
        for i, args in enumerate(zip(flat_g, flat_p, flat_m, flat_v, flat_e))
    ]
    unflat = lambda i: jax.tree_util.tree_unflatten(
        treedef, [o[i] for o in outs]
    )
    return unflat(0), unflat(1), unflat(2), unflat(3)


def adam_sr_nu(
    learning_rate: Union[float, Callable[[jax.Array], jax.Array]],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """optax.adam with the second moment stored bf16 via stochastic rounding.

    The staged-optax counterpart of ``FusedAdamEma(nu_dtype='bfloat16')``
    for the sharded (FSDP/TP) path, where the fused single-sweep update
    is not used: state tree shape and math are identical to
    ``optax.adam`` (``ScaleByAdamState``; bias-corrected, eps outside
    the sqrt), only nu's STORAGE narrows. The SR key is derived from the
    step count (deterministic across resume), folded per leaf;
    ``jax_threefry_partitionable`` (default on) keeps the random-bit
    generation sharded under pjit, so no gathers are introduced.
    """
    sr_dtype = jnp.bfloat16
    mu_cast = (lambda m: m.astype(mu_dtype)) if mu_dtype else (lambda m: m)

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: mu_cast(jnp.zeros_like(p)), params),
            nu=jax.tree.map(
                lambda p: jnp.zeros(p.shape, sr_dtype), params
            ),
        )

    def update_fn(updates, state, params=None):
        del params
        count_inc = state.count + 1
        t = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** t
        bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** t
        base_key = jax.random.fold_in(jax.random.PRNGKey(0x6E75), state.count)

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        out_u, out_m, out_v = [], [], []
        for i, (g, m, v) in enumerate(zip(flat_g, flat_m, flat_v)):
            g = g.astype(jnp.float32)
            m_new = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v_new = b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g
            out_u.append((m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps))
            out_m.append(mu_cast(m_new))
            out_v.append(
                stochastic_round_bf16(v_new, jax.random.fold_in(base_key, i))
            )
        unflat = lambda leaves: jax.tree_util.tree_unflatten(treedef, leaves)
        new_state = optax.ScaleByAdamState(
            count=count_inc, mu=unflat(out_m), nu=unflat(out_v)
        )
        return unflat(out_u), new_state

    return optax.chain(
        optax.GradientTransformation(init_fn, update_fn),
        optax.scale_by_learning_rate(learning_rate),
    )


class FusedAdamEma:
    """Adam + EMA with optax-compatible state.

    ``init`` delegates to ``optax.adam`` so the optimizer state tree
    (``(ScaleByAdamState, ...)``) and therefore checkpoints are identical
    to the unfused path; ``update_with_ema`` replaces
    ``optimizer.update + apply_updates + incremental_update`` with the
    single-sweep kernel.
    """

    def __init__(
        self,
        learning_rate: Union[float, Callable[[jax.Array], jax.Array]],
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        default_mode: Optional[str] = None,  # see fused_adam_ema(mode=...)
        mu_dtype: Optional[Any] = None,  # narrower first-moment storage
        nu_dtype: Optional[Any] = None,  # narrower second moment (SR, bf16)
    ):
        self.learning_rate = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps
        self.default_mode = default_mode
        # mu_dtype mirrors optax.adam's knob: the first moment is STORED
        # in the given dtype (e.g. bf16 halves its HBM: 1.35 GB for XL/2)
        # while all update math stays fp32. The m update's per-step
        # relative increment is (1-b1)=10%, far above bf16's ~0.4%
        # resolution, so round-to-nearest is benign there. Deviation from
        # the reference's fp32 apex FusedAdam state; opt-in, bounded by
        # tests/test_fused_adam.py::test_bf16_mu_tracks_fp32.
        #
        # nu_dtype stores the SECOND moment narrow (another 1.35 GB for
        # XL/2) — but nu's per-step increment (1-b2)=0.1% is BELOW bf16
        # resolution, so it is written back with STOCHASTIC rounding
        # (see stochastic_round_bf16) keyed deterministically off the
        # Adam step count: unbiased in expectation, ~2.5% stationary
        # relative noise in nu (~1.25% under the sqrt). The model EMA
        # stays exact fp32 always (SR there would accumulate ~8% noise).
        self.nu_dtype = jnp.dtype(nu_dtype) if nu_dtype is not None else None
        if self.nu_dtype is not None and self.nu_dtype != jnp.bfloat16:
            raise ValueError(
                f"nu_dtype={nu_dtype}: only bfloat16 narrow nu storage is "
                "implemented (stochastic rounding targets bf16)"
            )
        self._optax = optax.adam(
            learning_rate=learning_rate, b1=b1, b2=b2, eps=eps,
            mu_dtype=mu_dtype,
        )

    def init(self, params: Any):
        state = self._optax.init(params)
        if self.nu_dtype is not None:
            adam = state[0]
            state = (
                adam._replace(
                    nu=jax.tree.map(
                        lambda v: v.astype(self.nu_dtype), adam.nu
                    )
                ),
                *state[1:],
            )
        return state

    # optax fallback surface so the object can stand in for a
    # GradientTransformation where the fused path isn't wanted.
    def update(self, grads, state, params=None):
        if self.nu_dtype is not None:
            raise NotImplementedError(
                "nu_dtype requires the fused update_with_ema path (plain "
                "optax would re-widen nu and skip stochastic rounding)"
            )
        return self._optax.update(grads, state, params)

    def update_with_ema(
        self,
        grads: Any,
        opt_state: Any,
        params: Any,
        ema: Any,
        ema_decay: Union[float, jax.Array] = 0.9999,
        with_ema: bool = True,
        mode: Optional[str] = None,
    ):
        adam_state = opt_state[0]
        count_inc = adam_state.count + 1
        lr = (
            self.learning_rate(adam_state.count)
            if callable(self.learning_rate)
            else self.learning_rate
        )
        # SR key is derived from the step count: deterministic across
        # resume (same count -> same rounding), fresh bits every step
        nu_sr_key = (
            jax.random.fold_in(jax.random.PRNGKey(0x6E75), adam_state.count)
            if self.nu_dtype is not None else None
        )
        new_p, new_m, new_v, new_e = fused_adam_ema(
            grads, params, adam_state.mu, adam_state.nu, ema,
            lr=jnp.asarray(lr), count_inc=count_inc,
            b1=self.b1, b2=self.b2, eps=self.eps,
            ema_decay=ema_decay, with_ema=with_ema,
            mode=mode or self.default_mode,
            nu_sr_key=nu_sr_key,
        )
        new_adam = adam_state._replace(count=count_inc, mu=new_m, nu=new_v)
        # the trailing transforms (lr scaling / empty state) are stateless
        # for constant lr; for schedules bump their count to stay in sync
        rest = tuple(
            s._replace(count=count_inc)
            if "count" in getattr(s, "_fields", ()) else s
            for s in opt_state[1:]
        )
        return new_p, (new_adam, *rest), new_e
