"""Train state and the fused training step.

One jitted step covers the whole hot loop of reference train.py:198-287:
moments->z reparameterization (utils.py:59-65), CFG label dropout
(train.py:208-209), grad accumulation (train.py:211-227), EDM loss, AdamW
with kimg LR warmup (train.py:223-226), and the EMA update (helper.py:48-58)
— no host round-trips inside the step.

Numerics: params, optimizer state and EMA in fp32; model matmuls in the
model's compute dtype (bf16 by default) — the TPU analogue of the
reference's fp16-AMP-with-fp32-master-weights setup (deliberate divergence
documented in SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from maskdit_tpu.models.precond import EDMPrecond
from maskdit_tpu.train.loss import EDMLoss
from maskdit_tpu.train.schedules import lr_with_rampup


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any


def reparameterize_moments(
    rng: jax.Array, moments: jax.Array, scale_factor: float = 0.18215
) -> jax.Array:
    """VAE moments (N, 2C, H, W) -> z (N, C, H, W) (reference: utils.py:59-65).

    Done on device per step — drawing a fresh z from the stored posterior
    each epoch acts as data augmentation (SURVEY.md §3.5 note).
    """
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return scale_factor * z


def make_optimizer(
    base_lr: float,
    global_batch_size: int,
    rampup_kimg: float = 0.0,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    fused: Any = False,  # False | True | 'pallas' | 'jnp'
    moment_dtype: Any = None,  # e.g. 'bfloat16': narrower Adam mu storage
    nu_dtype: Any = None,  # 'bfloat16': narrower Adam nu (stochastic rounding)
):
    """AdamW matching apex FusedAdam(adam_w_mode=True, wd=0) + kimg warmup
    (reference: train.py:141, 223-226).

    ``fused=True`` returns a :class:`~maskdit_tpu.ops.fused_adam.FusedAdamEma`
    (single-sweep Adam+EMA, optax-compatible state). Its default 'jnp'
    mode is one elementwise expression per leaf, which GSPMD partitions
    over fsdp/tensor-sharded params without gathers — safe on any mesh
    (equality vs staged optax on a sharded mesh is pinned by
    tests/test_sharded_numerics.py). The opt-in Pallas kernel mode
    (``fused='pallas'``) reshapes each leaf to (rows, 128) and is for
    replicated params only.

    ``moment_dtype='bfloat16'`` stores the Adam FIRST moment in bf16
    (optax's mu_dtype; math stays fp32) — an opt-in approximation beyond
    the reference's fp32 apex state that frees 1.35 GB of HBM for XL/2,
    buying larger micro-batches at the accumulation memory wall. The
    second moment and EMA stay fp32 (their per-step increments are at or
    below bf16 resolution). Rounding bounded by
    tests/test_fused_adam.py::test_bf16_mu_tracks_fp32.

    ``nu_dtype='bfloat16'`` additionally stores the SECOND moment in bf16
    (another 1.35 GB for XL/2). nu's per-step increment (1-b2)=0.1% is
    below bf16 resolution, so the narrow store uses STOCHASTIC rounding
    (unbiased; ~2.5% stationary relative noise in nu — see
    ops/fused_adam.py:stochastic_round_bf16). With ``fused`` it rides the
    single-sweep update; without (the sharded FSDP/TP path) it builds
    :func:`~maskdit_tpu.ops.fused_adam.adam_sr_nu`, the staged-optax
    equivalent. The EMA always stays exact fp32.
    """
    mu_dtype = jnp.dtype(moment_dtype) if moment_dtype is not None else None
    if nu_dtype is not None and weight_decay != 0.0:
        raise NotImplementedError(
            "nu_dtype with weight_decay: the reference trains at wd=0 "
            "(configs/train/*.yaml); chain add_decayed_weights if needed"
        )
    if rampup_kimg > 0:
        schedule = lambda step: lr_with_rampup(
            step, base_lr, global_batch_size, rampup_kimg
        )
    else:
        schedule = base_lr
    if fused:
        if weight_decay != 0.0:
            raise NotImplementedError(
                "fused Adam+EMA implements wd=0 (the reference setting, "
                "configs/train/*.yaml)"
            )
        from maskdit_tpu.ops.fused_adam import FusedAdamEma

        return FusedAdamEma(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
            default_mode=fused if isinstance(fused, str) else None,
            mu_dtype=mu_dtype,
            nu_dtype=jnp.dtype(nu_dtype) if nu_dtype is not None else None,
        )
    if nu_dtype is not None:
        from maskdit_tpu.ops.fused_adam import adam_sr_nu

        if jnp.dtype(nu_dtype) != jnp.bfloat16:
            raise ValueError(f"nu_dtype={nu_dtype}: only bfloat16 supported")
        return adam_sr_nu(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
            mu_dtype=mu_dtype,
        )
    if weight_decay == 0.0:
        # adam == adamw at wd 0, minus one full decay pass over the params
        return optax.adam(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
            mu_dtype=mu_dtype,
        )
    return optax.adamw(
        learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay, mu_dtype=mu_dtype,
    )


def create_train_state(
    model: EDMPrecond,
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    batch_size: int = 1,
    mask_ratio: float = 0.5,
) -> TrainState:
    """Initialize params (reference init semantics), EMA copy, opt state."""
    x = jnp.zeros(
        (batch_size, model.img_channels, model.img_resolution, model.img_resolution)
    )
    sigma = jnp.ones((batch_size,))
    y = (
        jnp.zeros((batch_size, model.num_classes))
        if model.num_classes
        else None
    )
    params_rng, mask_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "mask": mask_rng},
        x, sigma, y, mask_ratio=mask_ratio, train=True,
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(lambda p: p, params),
        opt_state=optimizer.init(params),
    )


def _apply_updates_fused(optimizer, params, grads, opt_state, ema, ema_decay,
                         step, ema_every: int = 1):
    """Optimizer + EMA update.

    When ``optimizer`` is a :class:`~maskdit_tpu.ops.fused_adam.FusedAdamEma`
    the whole update (Adam moments + param step + EMA) runs as one
    single-sweep expression per leaf (default mode='jnp'; XLA streams it
    at ~596 GB/s on v5e, ~41 ms for 675M fp32 params — measured equal to
    the staged optax chain, which XLA fuses just as well; the Pallas
    kernel variant is opt-in, see ops/fused_adam.py). Otherwise it stages
    through optax.

    ema_every > 1 amortizes the EMA traffic (measured 15-28 ms/step for
    675M fp32 params): the EMA pass runs every k-th step with decay^k,
    i.e. the same exponential horizon sampled at k-step intervals. k=1 is
    the reference's exact per-step EMA (helper.py:48-58); at decay 0.9999
    (horizon ~10K steps) k<=8 is numerically indistinguishable for
    evaluation purposes but is still an approximation - off by default.
    """
    from maskdit_tpu.ops.fused_adam import FusedAdamEma

    if isinstance(optimizer, FusedAdamEma):
        if ema_every <= 1:
            return optimizer.update_with_ema(
                grads, opt_state, params, ema, ema_decay=ema_decay
            )
        decay_k = ema_decay ** ema_every
        do_ema = (step + 1) % ema_every == 0
        # both branches run the identical kernel; only the decay scalar
        # and with_ema flag differ, selected by a traced predicate
        eff_decay = jnp.where(do_ema, decay_k, 1.0)
        return optimizer.update_with_ema(
            grads, opt_state, params, ema, ema_decay=eff_decay
        )

    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    if ema_every <= 1:
        new_ema = optax.incremental_update(
            new_params, ema, step_size=1.0 - ema_decay
        )
    else:
        step_size = 1.0 - ema_decay ** ema_every

        def do_update(operands):
            p, e = operands
            return optax.incremental_update(p, e, step_size=step_size)

        new_ema = jax.lax.cond(
            (step + 1) % ema_every == 0,
            do_update,
            lambda operands: operands[1],
            (new_params, ema),
        )
    return new_params, new_opt_state, new_ema


def make_train_step(
    model: EDMPrecond,
    optimizer: optax.GradientTransformation,
    loss_fn: Optional[EDMLoss] = None,
    mask_ratio: float = 0.5,
    mae_loss_coef: float = 0.0,
    class_dropout_prob: float = 0.1,
    ema_decay: float = 0.9999,
    grad_accum: int = 1,
    scale_factor: float = 0.18215,
    reparam_moments: bool = True,
    log_grad_norm: bool = True,  # costs one extra pass over the gradients
    ema_every: int = 1,  # >1 amortizes EMA traffic with decay^k (approx.)
    pad_to_max: bool = False,
    mask_len_max: Optional[int] = None,
    amp_grads: bool = False,
    accum_dtype: Optional[str] = None,
    accum_unroll: int = 1,
    peel_last_micro: bool = False,
    microbatch_sharding: Optional[Any] = None,
) -> Callable[[TrainState, dict, jax.Array], tuple[TrainState, dict]]:
    """Build the jittable train step.

    batch: {'x': (N, C or 2C, H, W) latents-or-moments, 'y': (N, K) one-hot}.
    ``mask_ratio`` is static; build one step per bucketed ratio.

    ``pad_to_max=True`` compiles ONE step for every mask ratio: the per-step
    ratio arrives as ``batch['mask_ratio']`` (a scalar array) and masking
    pads the packed buffer to ``mask_len_max`` tokens (default: the full
    sequence, supporting any schedule) with attention masking on the tail.
    Numerics match the packed-exact path; FLOPs are those of mask_len_max.
    Measured on v5e (XL/2 @256, bs32): padded-to-full at ratio 0.5 =
    260.7 ms/step vs packed 129.2 ms (2.02x — the mask_len_max FLOPs,
    as claimed), independent of the runtime ratio (one compiled program).
    Guidance: constant-ratio pretraining (the released configs) should
    use the packed path; schedule finetunes use pad_to_max (one compile
    for the whole schedule) or, if every step matters, bucketed packed
    recompiles — the padded premium vanishes as the schedule's ratio
    approaches 0 because packed-at-low-ratio also runs near-full length.

    ``amp_grads=True`` differentiates against a bf16 copy of the params, so
    the materialized gradient tree is bf16 (half the HBM). Master params /
    Adam moments / EMA stay fp32; each wgrad is still accumulated in fp32
    inside the matmul and rounded once at the output. NOTE this goes
    *beyond* the reference's AMP: torch/Accelerate fp16 autocast
    (reference train.py:48) only affects forward compute — params and
    .grad buffers stay fp32 there — so bf16 grads are a measured, tested
    approximation, not reference parity (update deltas within bf16
    rounding of the fp32 path, tests/test_train.py::test_amp_grads_*).

    ``accum_dtype`` sets the gradient-accumulation buffer dtype for
    ``grad_accum > 1`` (default: the gradient dtype, i.e. fp32 — exact,
    and the reference-parity choice: Accelerate accumulates fp32 .grad
    buffers across micro-steps). 'bfloat16' halves the accumulator's HBM
    footprint, which is what makes large accumulated batches fit next to
    the 10.8 GB fp32 optimizer state on one v5e; it adds rounding the
    reference lacks (bounded by tests/test_train.py::
    test_grad_accum_bf16_accumulator_tracks_fp32). The headline bench
    configs use it deliberately; fp32 remains the default.

    ``accum_unroll`` unrolls the accumulation scan body by that factor:
    XLA then sees ``s + g_i + g_{i+1} ...`` per carry round and can fuse
    the adds into one pass over the accumulator, cutting its HBM
    read/write traffic by ~(unroll-1)/unroll at the cost of a
    proportionally larger compiled body. Numerics: unchanged up to fp
    re-association inside one carry round (exactly the reordering a
    tree-reduce would give). grad_accum must be divisible by it.
    MEMORY: the unrolled round keeps both duplicated bodies' activation
    liveness simultaneously — measured on 16 GB v5e at XL/2 @256,
    unroll=2 OOMs by ~3.0 GB even at micro-30 (the compile-time OOM is
    surfaced as an opaque HTTP 500 by this box's remote-compile tunnel).
    Usable at smaller micros or on larger-HBM parts.

    ``peel_last_micro`` computes the LAST micro-batch's gradients outside
    the accumulation scan. Inside a scan, every leaf's total gradient
    only materializes when the whole scan ends, so the optimizer waits
    for all of bwd; peeled, leaf L's update depends on scan-carry[L] +
    the last micro's wgrad[L], which completes partway through the last
    backward — XLA may overlap the ~52 ms Adam+EMA stream with the tail
    of that bwd. Numerics identical (same adds, same order). MEMORY: the
    peeled micro's bwd cannot share buffers with the scan body, so its
    whole gradient tree + activations add to the bwd/optimizer-boundary
    peak — measured +3.4-3.8 GB over budget at micro-28/30 on v5e
    (OOM, also surfaced as HTTP 500). Only viable at small micros,
    where the accumulation ladder already loses — kept for parts with
    more HBM headroom.
    """
    loss_fn = loss_fn or EDMLoss()
    patch_size = int(model.model_type.rsplit("/", 1)[1])
    if pad_to_max and mask_len_max is None:
        mask_len_max = (model.img_resolution // patch_size) ** 2

    def microbatch_loss(params, x, y, feat, rng, ratio):
        def net_apply(xin, sigma, labels, m_ratio, f, rngs, mask_info=None):
            return model.apply(
                {"params": params}, xin, sigma, labels,
                mask_ratio=m_ratio, mask_info=mask_info, feat=f, train=True,
                rngs=rngs,
            )

        loss_vec, aux = loss_fn(
            net_apply, x, rng, labels=y, mask_ratio=ratio,
            mae_loss_coef=mae_loss_coef, patch_size=patch_size, feat=feat,
            mask_len_max=mask_len_max if pad_to_max else None,
        )
        return loss_vec.mean(), aux

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        ratio = batch["mask_ratio"] if pad_to_max else mask_ratio
        rng = jax.random.fold_in(rng, state.step)
        rng_z, rng_drop, rng_loss = jax.random.split(rng, 3)

        x = batch["x"].astype(jnp.float32)
        if reparam_moments and x.shape[1] == 2 * model.img_channels:
            x = reparameterize_moments(rng_z, x, scale_factor)

        y = batch.get("y")
        feat = batch.get("feat")
        if y is not None and class_dropout_prob > 0:
            keep = (
                jax.random.uniform(rng_drop, (y.shape[0], 1))
                >= class_dropout_prob
            ).astype(y.dtype)
            y = y * keep

        net_params = (
            jax.tree.map(lambda p: p.astype(jnp.bfloat16), state.params)
            if amp_grads else state.params
        )

        if grad_accum == 1:
            (loss, aux), grads = grad_fn(net_params, x, y, feat, rng_loss, ratio)
        else:
            micro = x.shape[0] // grad_accum

            def split(a):
                return (
                    a.reshape(grad_accum, micro, *a.shape[1:])
                    if a is not None else None
                )

            xs, ys, feats = split(x), split(y), split(feat)

            if microbatch_sharding is not None:
                # Re-anchor the batch sharding after the (N,) ->
                # (grad_accum, micro) reshape: GSPMD's propagation gives
                # up on this reshape and REPLICATES the micro-batches,
                # which turns every weight matmul into a partial-sum +
                # full-activation all-reduce (604 MB fp32 per fc1 per
                # micro at XL/2 micro-256 — found by
                # tools/xl_shard_report.py's collective inventory).
                # Constrained, each scan slice stays batch-sharded and
                # GSPMD gathers the (10 MB) weights instead.
                cons = lambda a: (
                    None if a is None
                    else jax.lax.with_sharding_constraint(
                        a, microbatch_sharding
                    )
                )
                xs, ys, feats = cons(xs), cons(ys), cons(feats)

            def accum(carry, inputs):
                g_sum, l_sum = carry
                if feats is None:
                    i, x_i, y_i = inputs
                    f_i = None
                else:
                    i, x_i, y_i, f_i = inputs
                (l, aux_i), g = grad_fn(
                    net_params, x_i, y_i, f_i,
                    jax.random.fold_in(rng_loss, i), ratio,
                )
                g_sum = jax.tree.map(
                    lambda s, gi: s + gi.astype(s.dtype), g_sum, g
                )
                return (g_sum, l_sum + l), aux_i

            acc_dt = jnp.dtype(accum_dtype) if accum_dtype else None
            g0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, acc_dt or p.dtype), state.params
            )
            scan_xs = (
                (jnp.arange(grad_accum), xs, ys) if feats is None
                else (jnp.arange(grad_accum), xs, ys, feats)
            )
            n_scan = grad_accum - 1 if peel_last_micro else grad_accum
            if n_scan % max(accum_unroll, 1):
                raise ValueError(
                    f"scanned micro count {n_scan} not divisible by "
                    f"accum_unroll={accum_unroll}"
                )
            head = (
                jax.tree.map(lambda a: a[:n_scan], scan_xs)
                if peel_last_micro else scan_xs
            )
            (grads, loss_sum), auxs = jax.lax.scan(
                accum, (g0, 0.0), head, unroll=max(accum_unroll, 1)
            )
            aux = jax.tree.map(lambda a: a.mean(), auxs)
            if peel_last_micro:
                (l_last, aux_last), g_last = grad_fn(
                    net_params,
                    xs[-1], None if ys is None else ys[-1],
                    None if feats is None else feats[-1],
                    jax.random.fold_in(rng_loss, grad_accum - 1), ratio,
                )
                grads = jax.tree.map(
                    lambda s, g: s + g.astype(s.dtype), grads, g_last
                )
                loss_sum = loss_sum + l_last
                aux = jax.tree.map(
                    lambda h, l: (h * n_scan + l) / grad_accum, aux, aux_last
                )
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            loss = loss_sum / grad_accum

        # NOTE (r5, measured): the cross-device gradient reduction runs at
        # fp32 even under the bf16 accumulator — GSPMD resolves the
        # batch-contraction partial sums at its own placement (2.72 GB
        # fp32 per step at XL/2 on {data:8}, tools/xl_shard_report.py),
        # and neither a with_sharding_constraint on the bf16 grads nor an
        # optimization_barrier moves it (both measured HLO-identical on a
        # 4-dev mesh). Halving those wire bytes would need an explicit
        # shard_map psum of the accumulator — not worth it at the
        # measured scale (66 ms of a 4.9 s ga-48 step over ICI; ~9% only
        # when the gradient reduce crosses DCN).

        new_params, new_opt_state, new_ema = _apply_updates_fused(
            optimizer, state.params, grads, state.opt_state,
            state.ema_params, ema_decay, state.step, ema_every=ema_every,
        )

        metrics = {"loss": loss, **aux}
        if log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step
