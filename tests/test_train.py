"""Objective-layer tests: loss masking math, schedules, train-state pieces."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskdit_tpu.train import schedules
from maskdit_tpu.train.loss import EDMLoss, mae_loss, patchify, per_patch_mean
from maskdit_tpu.train.state import reparameterize_moments


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

def test_mask_ratio_fns():
    f = schedules.get_mask_ratio_fn("constant", 0.5)
    assert f(0.0) == f(1.0) == 0.5
    f = schedules.get_mask_ratio_fn("linear", 0.5, 0.1)
    assert abs(f(0.0) - 0.1) < 1e-9 and abs(f(1.0) - 0.5) < 1e-9
    f = schedules.get_mask_ratio_fn("cosine4", 0.5, 0.1)
    assert abs(f(0.0) - 0.5) < 1e-9
    assert abs(f(1.0) - 0.1) < 1e-9
    assert abs(f(0.5) - (0.4 * math.cos(math.pi / 4) ** 4 + 0.1)) < 1e-9
    # the shipped config typo 'cos4' must resolve to cosine4 (SURVEY.md §5)
    f2 = schedules.get_mask_ratio_fn("cos4", 0.5, 0.1)
    assert f2(0.3) == f(0.3)
    with pytest.raises(ValueError):
        schedules.get_mask_ratio_fn("cosine9")


def test_bucket_ratio():
    # len_keep lands on multiples of 16; ratio 0.5 at L=256 stays exact
    assert schedules.bucket_ratio(0.5, 256) == 0.5
    r = schedules.bucket_ratio(0.47, 256)
    assert abs((1 - r) * 256 - round((1 - r) * 256)) < 1e-9
    assert int((1 - r) * 256) % 16 == 0
    assert schedules.bucket_ratio(0.999, 256) <= 1 - 16 / 256


def test_lr_rampup():
    lr = schedules.lr_with_rampup(100, 1e-4, 1024, rampup_kimg=1000)
    assert abs(float(lr) - 1e-4 * 100 * 1024 / 1e6) < 1e-9
    lr_full = schedules.lr_with_rampup(10**6, 1e-4, 1024, rampup_kimg=1000)
    assert abs(float(lr_full) - 1e-4) < 1e-9


# ---------------------------------------------------------------------------
# loss pieces
# ---------------------------------------------------------------------------

def test_patchify_roundtrip_order():
    x = jnp.arange(2 * 4 * 8 * 8, dtype=jnp.float32).reshape(2, 4, 8, 8)
    p = patchify(x, 2)
    assert p.shape == (2, 16, 16)
    # patch 0 must be the top-left 2x2 of every channel, (ph, pw, c) order
    first = np.asarray(p[0, 0]).reshape(2, 2, 4)
    for c in range(4):
        np.testing.assert_array_equal(
            first[:, :, c], np.asarray(x[0, c, :2, :2])
        )


def test_per_patch_mean_matches_avgpool():
    import torch

    x = np.random.default_rng(0).normal(size=(2, 4, 8, 8)).astype(np.float32)
    ours = np.asarray(per_patch_mean(jnp.asarray(x), 2))
    theirs = (
        torch.nn.functional.avg_pool2d(torch.from_numpy(x).mean(dim=1), 2)
        .flatten(1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mae_loss_masked_only():
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.normal(size=(2, 4, 8, 8)).astype(np.float32))
    pred = target + 1.0  # constant error of 1 -> per-patch loss 1 everywhere
    mask = jnp.zeros((2, 16)).at[:, :4].set(1.0)
    loss = mae_loss(target, pred, mask, 2, norm_pix_loss=False)
    np.testing.assert_allclose(np.asarray(loss), 1.0, rtol=1e-5)


def test_edm_loss_mask_restriction():
    """DSM term must average only over unmasked patches."""
    loss_obj = EDMLoss()
    n, c, h, w = 2, 4, 8, 8
    images = jnp.zeros((n, c, h, w))
    mask = jnp.zeros((n, 16)).at[:, 8:].set(1.0)  # half masked

    def net_apply(xin, sigma, labels, m_ratio, feat, rngs, mask_info=None):
        # denoiser that returns the noised input -> error = noise
        return {"x": xin, "mask": mask}

    loss_vec, aux = loss_obj(
        net_apply, images, jax.random.PRNGKey(0), labels=None,
        mask_ratio=0.5, mae_loss_coef=0.0, patch_size=2,
    )
    assert loss_vec.shape == (n,)
    assert np.isfinite(np.asarray(loss_vec)).all()
    # with D=x_noised: loss = weight * n^2; weight*sigma^2 >= 1 => loss >= ~1
    assert (np.asarray(loss_vec) > 0).all()


def test_edm_loss_unmasked_path():
    loss_obj = EDMLoss()
    images = jnp.zeros((3, 4, 8, 8))

    def net_apply(xin, sigma, labels, m_ratio, feat, rngs, mask_info=None):
        return {"x": xin}  # D = y+n -> error = n -> loss = weight * n^2

    loss_vec, aux = loss_obj(
        net_apply, images, jax.random.PRNGKey(1), mask_ratio=0.0,
    )
    assert loss_vec.shape == (3,)
    # E[weight * n^2] = weight * sigma^2 = 1 + sigma^2/sd^2 >= 1
    assert (np.asarray(loss_vec) > 0.5).all()


def test_reparameterize_moments():
    mean = jnp.full((1, 2, 4, 4), 3.0)
    logvar = jnp.full((1, 2, 4, 4), -60.0)  # clipped to -30 -> std ~ 3e-7
    moments = jnp.concatenate([mean, logvar], axis=1)
    z = reparameterize_moments(jax.random.PRNGKey(0), moments)
    np.testing.assert_allclose(np.asarray(z), 3.0 * 0.18215, atol=1e-4)


def test_train_step_runs_and_learns(tiny_dit):
    """Tiny end-to-end: two steps reduce loss deterministically? At least
    run, update params, keep EMA in sync, bump step."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=4)
    state = create_train_state(model, jax.random.PRNGKey(0), opt, batch_size=2)
    step = jax.jit(make_train_step(model, opt, mask_ratio=0.5, mae_loss_coef=0.1))
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(4) % 4, 4),
    }
    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    state, m = step(state, batch, jax.random.PRNGKey(2))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 2
    assert np.isfinite(float(m["loss"]))
    # adaLN-Zero init gates most gradients for the first steps; at least the
    # final layer must have moved
    total_delta = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p0))
    )
    assert total_delta > 0
    # EMA at decay 0.9999 stays within a hair of params after 2 steps
    dev = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params)
        )
    )
    assert dev < 1e-2


def test_train_step_with_ext_features(tiny_dit):
    """ext_feature_dim > 0: batch['feat'] conditions the model
    (reference: train feature path, datasets.py:286-295 + maskdit feat_embedder)."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        ext_feature_dim=16, dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=4)
    # init needs a feat arg present
    x0 = jnp.zeros((1, 4, 8, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        x0, jnp.ones((1,)), jnp.zeros((1, 4)), mask_ratio=0.5,
        feat=jnp.zeros((1, 16)), train=True,
    )
    from maskdit_tpu.train.state import TrainState

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        ema_params=variables["params"], opt_state=opt.init(variables["params"]),
    )
    step = jax.jit(make_train_step(model, opt, mask_ratio=0.5,
                                   mae_loss_coef=0.1, grad_accum=2))
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(4) % 4, 4),
        "feat": jax.random.normal(jax.random.PRNGKey(2), (4, 16)),
    }
    state, m = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    # different features change the loss (conditioning is live)
    batch2 = dict(batch, feat=batch["feat"] * 100.0)
    _, m2 = step(state, batch2, jax.random.PRNGKey(3))
    assert float(m["loss"]) != float(m2["loss"])


def test_train_step_finetune_mode(tiny_dit):
    """mask_ratio=0 (unmasked finetune, reference configs/finetune/*): the
    full step runs with the plain mean-flat loss and no mask RNG use."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(5e-5, global_batch_size=4)
    state = create_train_state(model, jax.random.PRNGKey(0), opt, batch_size=2)
    step = jax.jit(make_train_step(model, opt, mask_ratio=0.0, mae_loss_coef=0.1))
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(4) % 4, 4),
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    assert "mae_loss" not in m  # no MAE term without masking


def test_ema_every_amortization(tiny_dit):
    """ema_every=k: EMA only moves on every k-th step, with decay^k."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-2, global_batch_size=2)
    state = create_train_state(model, jax.random.PRNGKey(0), opt, batch_size=2)
    step = jax.jit(make_train_step(model, opt, mask_ratio=0.0, ema_every=2,
                                   ema_decay=0.5))
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(2) % 4, 4),
    }
    ema0 = jax.tree.leaves(state.ema_params)
    state, _ = step(state, batch, jax.random.PRNGKey(2))  # step 1: no EMA move
    same = all(
        np.array_equal(a, b)
        for a, b in zip(ema0, jax.tree.leaves(state.ema_params))
    )
    assert same
    state, _ = step(state, batch, jax.random.PRNGKey(2))  # step 2: EMA moves
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(ema0, jax.tree.leaves(state.ema_params))
    )
    assert moved


def test_amp_grads_step_close_to_fp32(tiny_dit):
    """amp_grads=True (bf16 gradient tree, the reference's AMP design) must
    track the fp32-grad step closely and keep fp32 master params."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state, make_optimizer, make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=10,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32,
    )
    opt = make_optimizer(1e-4, global_batch_size=4)
    state0 = create_train_state(model, jax.random.PRNGKey(0), opt, batch_size=2)
    rng = jax.random.PRNGKey(1)
    batch = {
        "x": jax.random.normal(jax.random.fold_in(rng, 0), (4, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(4) % 10, 10),
    }
    kw = dict(mask_ratio=0.5, mae_loss_coef=0.1, log_grad_norm=False)
    step_fp32 = jax.jit(make_train_step(model, opt, **kw))
    step_amp = jax.jit(make_train_step(model, opt, amp_grads=True, **kw))

    s1, m1 = step_fp32(state0, batch, rng)
    s2, m2 = step_amp(state0, batch, rng)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-2
    # master params stay fp32 and the two updates agree to bf16 precision
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree.leaves(deltas)) < 5e-4, max(jax.tree.leaves(deltas))
    assert all(
        p.dtype == jnp.float32 for p in jax.tree.leaves(s2.params)
    )


def test_grad_accum_bf16_accumulator_tracks_fp32(tiny_dit):
    """accum_dtype='bfloat16' (the memory-lean accumulation mode that lets
    large accumulated batches fit next to the fp32 optimizer state) must
    produce per-step parameter updates within bf16 rounding of the exact
    fp32 accumulation path. This mode is an approximation the reference
    lacks (Accelerate fp16 autocast affects forward compute only; .grad
    buffers accumulate fp32, reference train.py:48) — this test bounds
    the rounding it introduces."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=8)
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(8) % 4, 4),
    }
    rng = jax.random.PRNGKey(3)

    def one_step(accum_dtype):
        state = create_train_state(model, jax.random.PRNGKey(0), opt,
                                   batch_size=2)
        step = jax.jit(make_train_step(
            model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
            class_dropout_prob=0.0, grad_accum=2, accum_dtype=accum_dtype,
        ))
        state, m = step(state, batch, rng)
        return state, float(m["loss"])

    s32, l32 = one_step(None)
    s16, l16 = one_step("bfloat16")
    assert l32 == l16  # loss is computed before accumulation rounding
    # Adam's first step is ~ lr * sign(g), so elements whose grad is near
    # zero legitimately flip sign under ANY rounding of the accumulator.
    # The meaningful check is statistical: almost all update elements
    # match, and the typical deviation is at bf16-rounding scale.
    p0 = create_train_state(model, jax.random.PRNGKey(0), opt,
                            batch_size=2).params
    lr = 1e-3
    n_tot, n_off, devs = 0, 0, []
    for a, b, p in zip(jax.tree.leaves(s32.params), jax.tree.leaves(s16.params),
                       jax.tree.leaves(p0)):
        da, db = np.asarray(a - p), np.asarray(b - p)
        diff = np.abs(da - db)
        n_tot += diff.size
        n_off += int((diff > 0.05 * lr).sum())
        devs.append(np.median(diff))
    assert n_off / n_tot < 0.005, (n_off, n_tot)
    assert np.median(devs) < 0.01 * lr


def test_grad_accum_unroll_matches_sequential(tiny_dit):
    """accum_unroll only re-associates the in-round carry adds (a perf
    knob to cut accumulator HBM traffic); the step must match unroll=1
    to fp re-association tolerance, and indivisible factors must raise."""
    import pytest

    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=8)
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(8) % 4, 4),
    }
    rng = jax.random.PRNGKey(3)

    def one_step(unroll):
        state = create_train_state(model, jax.random.PRNGKey(0), opt,
                                   batch_size=2)
        step = jax.jit(make_train_step(
            model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
            class_dropout_prob=0.0, grad_accum=4, accum_unroll=unroll,
        ))
        state, m = step(state, batch, rng)
        return state, float(m["loss"])

    s1, l1 = one_step(1)
    s2, l2 = one_step(2)
    assert abs(l1 - l2) < 1e-6
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    state = create_train_state(model, jax.random.PRNGKey(0), opt, batch_size=2)
    bad = jax.jit(make_train_step(
        model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
        class_dropout_prob=0.0, grad_accum=4, accum_unroll=3,
    ))
    with pytest.raises(ValueError, match="divisible"):
        bad(state, batch, rng)


def test_peel_last_micro_matches_scanned(tiny_dit):
    """peel_last_micro computes the same sums in the same order (the last
    micro's grads are just added outside the scan); params, loss and aux
    must match the fully-scanned step to float tolerance."""
    from maskdit_tpu.models import create_model
    from maskdit_tpu.train.state import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        "edm", img_resolution=8, img_channels=4, num_classes=4,
        model_type="DiT-S/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.float32, use_flash=False,
    )
    opt = make_optimizer(1e-3, global_batch_size=8)
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 8)),
        "y": jax.nn.one_hot(jnp.arange(8) % 4, 4),
    }
    rng = jax.random.PRNGKey(3)

    def one_step(peel):
        state = create_train_state(model, jax.random.PRNGKey(0), opt,
                                   batch_size=2)
        step = jax.jit(make_train_step(
            model, opt, mask_ratio=0.5, mae_loss_coef=0.1,
            class_dropout_prob=0.0, grad_accum=4, peel_last_micro=peel,
        ))
        state, m = step(state, batch, rng)
        return state, m

    s0, m0 = one_step(False)
    s1, m1 = one_step(True)
    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-6
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_default_use_flash_keys_on_seq_len():
    """Accumulating SHORT-L configs disable the attention kernel (it
    loses under accum memory pressure at 256-res); long-L (512-res)
    configs stay on auto, where the blocked flash_big kernel is the
    measured winner even under accumulation. Plain steps stay auto."""
    from maskdit_tpu.train.trainer import default_use_flash

    assert default_use_flash(1, 256) is None      # plain 256-res: auto
    assert default_use_flash(24, 256) is False    # accum 256-res: off
    assert default_use_flash(32, 1024) is None    # accum 512-res: auto
    assert default_use_flash(1, 1024) is None     # plain 512-res: auto
