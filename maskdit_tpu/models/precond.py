"""EDM preconditioning wrapper around MaskDiT.

Reference: EDMPrecond (models/maskdit.py:722-781), from "Elucidating the
Design Space of Diffusion-Based Generative Models" (Karras et al.).

    c_skip  = sigma_d^2 / (sigma^2 + sigma_d^2)
    c_out   = sigma * sigma_d / sqrt(sigma^2 + sigma_d^2)
    c_in    = 1 / sqrt(sigma_d^2 + sigma^2)
    c_noise = log(sigma) / 4
    D_x     = c_skip * x + c_out * F_x(c_in * x, c_noise, y)

The preconditioning algebra runs in fp32; only the inner network runs in the
model compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskdit_tpu.models import masking
from maskdit_tpu.models.dit import MaskDiT, create_dit


class EDMPrecond(nn.Module):
    img_resolution: int
    img_channels: int
    num_classes: int = 0
    sigma_min: float = 0.0
    sigma_max: float = float("inf")
    sigma_data: float = 0.5
    model_type: str = "DiT-B/2"
    use_decoder: bool = False
    mae_loss_coef: float = 0.0
    pad_cls_token: bool = False
    ext_feature_dim: int = 0
    use_encoder_feat: bool = False
    class_dropout_prob: float = 0.1
    learn_sigma: bool = False
    dtype: Any = jnp.bfloat16
    use_flash: Optional[bool] = None
    remat: Any = False
    scan_blocks: bool = False

    def setup(self) -> None:
        self.model: MaskDiT = create_dit(
            self.model_type,
            input_size=self.img_resolution,
            in_channels=self.img_channels,
            num_classes=self.num_classes,
            use_decoder=self.use_decoder,
            mae_loss_coef=self.mae_loss_coef,
            pad_cls_token=self.pad_cls_token,
            ext_feature_dim=self.ext_feature_dim,
            use_encoder_feat=self.use_encoder_feat,
            class_dropout_prob=self.class_dropout_prob,
            learn_sigma=self.learn_sigma,
            dtype=self.dtype,
            use_flash=self.use_flash,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
        )

    def _coerce_labels(self, x: jax.Array, class_labels) -> Optional[jax.Array]:
        """None + conditional model -> zero label rows (reference: :760-762)."""
        if self.num_classes == 0:
            return None
        if class_labels is None:
            return jnp.zeros((x.shape[0], self.num_classes), jnp.float32)
        return class_labels.reshape(-1, self.num_classes).astype(jnp.float32)

    @staticmethod
    def _coeffs(sigma: jax.Array, sigma_data: float):
        sigma = sigma.astype(jnp.float32).reshape(-1, 1, 1, 1)
        c_skip = sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2)
        c_out = sigma * sigma_data * jax.lax.rsqrt(sigma ** 2 + sigma_data ** 2)
        c_in = jax.lax.rsqrt(sigma_data ** 2 + sigma ** 2)
        c_noise = jnp.log(sigma) / 4.0
        return sigma, c_skip, c_out, c_in, c_noise

    def __call__(
        self, x: jax.Array, sigma: jax.Array, class_labels=None,
        cfg_scale: Optional[float] = None, mask_ratio: float = 0.0,
        mask_info: Optional[masking.MaskInfo] = None,
        feat: Optional[jax.Array] = None, train: bool = False,
    ) -> dict:
        """Denoiser forward D(x; sigma) (reference: maskdit.py:756-773)."""
        x = x.astype(jnp.float32)
        y = self._coerce_labels(x, class_labels)
        sigma, c_skip, c_out, c_in, c_noise = self._coeffs(sigma, self.sigma_data)
        x_in = c_in * x
        if cfg_scale is None:
            model_out = self.model(
                x_in, c_noise.reshape(-1), y, mask_ratio=mask_ratio,
                mask_info=mask_info, feat=feat, train=train,
            )
        else:
            model_out = self.model.forward_with_cfg(
                x_in, c_noise.reshape(-1), y, cfg_scale, feat=feat
            )
        f_x = model_out["x"].astype(jnp.float32)
        model_out["x"] = c_skip * x + c_out * f_x
        return model_out

    def encode(
        self, x: jax.Array, sigma: jax.Array, class_labels=None,
        **model_kwargs,
    ) -> jax.Array:
        """Pooled encoder feature at noise level sigma (reference: :743-754)."""
        x = x.astype(jnp.float32)
        y = self._coerce_labels(x, class_labels)
        _, _, _, c_in, c_noise = self._coeffs(sigma, self.sigma_data)
        feat, _ = self.model.encode(
            c_in * x, c_noise.reshape(-1), y, **model_kwargs
        )
        return feat

    @staticmethod
    def round_sigma(sigma) -> jax.Array:
        return jnp.asarray(sigma)


PRECOND_MODELS = {"edm": EDMPrecond}


def create_model(
    precond: str = "edm",
    img_resolution: int = 32,
    img_channels: int = 4,
    **kwargs,
) -> EDMPrecond:
    """Registry entry point (reference: Precond_models, maskdit.py:779-781)."""
    if precond not in PRECOND_MODELS:
        raise KeyError(f"unknown precond '{precond}' (known: {sorted(PRECOND_MODELS)})")
    return PRECOND_MODELS[precond](
        img_resolution=img_resolution, img_channels=img_channels, **kwargs
    )
