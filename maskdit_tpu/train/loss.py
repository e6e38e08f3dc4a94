"""EDM denoising loss with per-patch masking + MAE auxiliary loss.

Reference: train_utils/loss.py:22-101. Per-sample:
  sigma ~ exp(N(P_mean, P_std)); weight = (sigma^2 + sd^2) / (sigma*sd)^2
  loss  = weight * ||D(y + n; sigma) - y||^2,
averaged per patch and restricted to *unmasked* patches (loss.py:45-49),
plus ``mae_loss_coef`` times a pixel-normalized MAE reconstruction loss on
the *masked* patches (loss.py:51-52, 88-101).

The reference's dummy ``0 * mask_token.sum()`` term (loss.py:57-58) exists
only to keep DDP gradient buckets alive during unmasked finetuning; JAX
gradients of unused parameters are simply zero, so it is not needed here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def patchify(imgs: jax.Array, patch_size: int = 2) -> jax.Array:
    """(N, C, H, W) -> (N, L, p*p*C) with (ph, pw, c) intra-patch order.

    Reference: train_utils/loss.py:73-85 (same einsum ordering).
    """
    n, c, hh, ww = imgs.shape
    p = patch_size
    assert hh == ww and hh % p == 0
    h = w = hh // p
    x = imgs.reshape(n, c, h, p, w, p)
    x = jnp.einsum("nchpwq->nhwpqc", x)
    return x.reshape(n, h * w, p * p * c)


def per_patch_mean(x: jax.Array, patch_size: int) -> jax.Array:
    """Channel-mean then p x p average pool, flattened to (N, L).

    Equivalent to the reference's ``F.avg_pool2d(loss.mean(1), p).flatten(1)``
    (loss.py:45); patch ordering is row-major (h, w), matching the mask.
    """
    n, _, hh, ww = x.shape
    p = patch_size
    xm = x.mean(axis=1)  # (N, H, W)
    xm = xm.reshape(n, hh // p, p, ww // p, p).mean(axis=(2, 4))
    return xm.reshape(n, -1)


def mae_loss(
    target: jax.Array,
    pred: jax.Array,
    mask: jax.Array,
    patch_size: int,
    norm_pix_loss: bool = True,
) -> jax.Array:
    """Mean per-patch MSE on masked patches (reference: loss.py:88-101).

    ``mask`` is 1 on masked (dropped) patches. With norm_pix_loss the target
    patch is standardized with the *unbiased* variance (torch .var default).
    """
    target = patchify(target, patch_size)
    pred = patchify(pred, patch_size)
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True, ddof=1)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    loss = jnp.square(pred - target).mean(axis=-1)  # (N, L)
    # max(count, 1): with a *traced* ratio (pad-to-max schedules) the mask
    # can be all-zero at ratio 0 — the term must vanish, not 0/0-NaN
    return (loss * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)


class EDMLoss:
    """Callable matching the reference Losses['edm'] surface (loss.py:22-60)."""

    def __init__(self, P_mean: float = -1.2, P_std: float = 1.2, sigma_data: float = 0.5):
        self.P_mean = P_mean
        self.P_std = P_std
        self.sigma_data = sigma_data

    def __call__(
        self,
        net_apply,  # callable(x, sigma, labels, mask_ratio, feat, rngs, mask_info)
        images: jax.Array,
        rng: jax.Array,
        labels: Optional[jax.Array] = None,
        mask_ratio: Any = 0.0,  # float (static) or traced scalar (padded)
        mae_loss_coef: float = 0.0,
        patch_size: int = 2,
        feat: Optional[jax.Array] = None,
        mask_len_max: Optional[int] = None,
    ) -> tuple[jax.Array, dict[str, Any]]:
        """Returns (per-sample loss (N,), aux dict).

        ``mask_len_max`` switches to pad-to-max masking: ``mask_ratio`` may
        then be a traced scalar — one compiled step serves every schedule
        value (SURVEY.md §7) — and the mask is drawn here so the model gets
        an explicit padded MaskInfo.
        """
        rng_sigma, rng_noise, rng_mask = jax.random.split(rng, 3)
        n_batch = images.shape[0]
        rnd_normal = jax.random.normal(rng_sigma, (n_batch, 1, 1, 1))
        sigma = jnp.exp(rnd_normal * self.P_std + self.P_mean)
        weight = (sigma ** 2 + self.sigma_data ** 2) / (sigma * self.sigma_data) ** 2

        y = images.astype(jnp.float32)
        noise = jax.random.normal(rng_noise, y.shape) * sigma

        if mask_len_max is not None:
            from maskdit_tpu.models import masking

            n_tokens = (images.shape[2] // patch_size) * (
                images.shape[3] // patch_size
            )
            # reference len_keep = int(L * (1 - ratio)) (maskdit.py:101)
            len_keep = jnp.floor(
                n_tokens * (1.0 - jnp.asarray(mask_ratio, jnp.float32))
            ).astype(jnp.int32)
            mask_info = masking.padded_random_mask(
                rng_mask, n_batch, n_tokens, mask_len_max, len_keep
            )
            masked = True
            # static gate for the model's masking branches; the actual
            # ratio lives in mask_info
            ratio_arg = 0.5
        else:
            mask_info = None
            masked = float(mask_ratio) > 0
            ratio_arg = float(mask_ratio)

        model_out = net_apply(
            y + noise, sigma.reshape(-1), labels, ratio_arg, feat,
            {"mask": rng_mask}, mask_info,
        )
        d_yn = model_out["x"].astype(jnp.float32)
        loss_px = weight * jnp.square(d_yn - y)  # (N, C, H, W)

        aux = {"sigma_mean": sigma.mean()}
        if masked:
            loss_patch = per_patch_mean(loss_px, patch_size)  # (N, L)
            unmask = 1.0 - model_out["mask"]
            # max(count, 1) guards the traced-ratio extreme (ratio -> 1
            # keeps zero tokens); at any real schedule point it is inert
            loss_vec = (loss_patch * unmask).sum(axis=1) / jnp.maximum(
                unmask.sum(axis=1), 1.0
            )
            aux["dsm_loss"] = loss_vec.mean()
            if mae_loss_coef > 0:
                mae = mae_loss(y + noise, d_yn, 1.0 - unmask, patch_size)
                aux["mae_loss"] = mae.mean()
                loss_vec = loss_vec + mae_loss_coef * mae
        else:
            loss_vec = loss_px.mean(axis=(1, 2, 3))
            aux["dsm_loss"] = loss_vec.mean()
        return loss_vec, aux


LOSSES = {"edm": EDMLoss}
