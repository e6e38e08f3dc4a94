"""MaskDiT: asymmetric masked diffusion transformer (encoder + light decoder).

TPU-native re-design of the reference backbone (models/maskdit.py:237-587):
a deep encoder runs on the *packed* unmasked tokens only (the 50% FLOP
saving, reference maskdit.py:483), then a DecoderLayer projects to the
decoder width, mask tokens are scattered back (maskdit.py:539-543), and 8
decoder DiTBlocks + FinalLayer produce per-patch outputs.

API mirrors the reference:
  out = model.apply(vars, x, t, y, mask_ratio=..., train=..., rngs={'mask': k})
  out is a dict with 'x' (N, out_channels, H, W) and, when masked, 'mask'.

``mask_ratio`` must be a static Python float (see masking.py docstring).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from maskdit_tpu.models import masking
from maskdit_tpu.models.layers import (
    DecoderLayer,
    DiTBlock,
    FinalLayer,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    layer_norm_no_affine,
    normal_002,
)

DECODER_HIDDEN_SIZE = 512  # reference: maskdit.py:310
DECODER_DEPTH = 8  # reference: maskdit.py:311
DECODER_NUM_HEADS = 16  # reference: maskdit.py:312


class _ScanBody(nn.Module):
    """One scan step: apply a DiTBlock, thread x as the carry."""

    block_cls: Any
    hidden_size: int
    c_emb_size: int
    num_heads: int
    mlp_ratio: float
    dtype: Any
    use_flash: Optional[bool]

    @nn.compact
    def __call__(self, x, c, kv_valid):
        x = self.block_cls(
            self.hidden_size, self.c_emb_size, self.num_heads,
            mlp_ratio=self.mlp_ratio, dtype=self.dtype,
            use_flash=self.use_flash, name="block",
        )(x, c, kv_valid)
        return x, None


class ScannedBlocks(nn.Module):
    """depth x DiTBlock as one lax.scan over stacked params.

    Identical math to the unrolled list; params gain a leading (depth,)
    axis (path: <name>/scan/block/...). HLO is ~depth-x smaller, which
    matters when XLA compile time is the bottleneck.
    """

    block_cls: Any
    depth: int
    hidden_size: int
    c_emb_size: int
    num_heads: int
    mlp_ratio: float
    dtype: Any
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array,
                 kv_valid: Optional[jax.Array] = None) -> jax.Array:
        scan = nn.scan(
            _ScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = scan(
            self.block_cls, self.hidden_size, self.c_emb_size,
            self.num_heads, self.mlp_ratio, self.dtype, self.use_flash,
            name="scan",
        )(x, c, kv_valid)
        return x


class MaskDiT(nn.Module):
    """Diffusion transformer with masked-token training.

    Field defaults mirror DiT.__init__ (reference: maskdit.py:242-261).
    """

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    use_decoder: bool = False
    mae_loss_coef: float = 0.0
    pad_cls_token: bool = False
    direct_cls_token: bool = False
    ext_feature_dim: int = 0
    use_encoder_feat: bool = False
    dtype: Any = jnp.bfloat16
    use_flash: Optional[bool] = None
    # activation rematerialization per block: 'none'; 'dots' saves matmul
    # outputs and recomputes elementwise chains (cheap recompute, ~2x less
    # activation memory); 'full' recomputes everything (measured 2.5x
    # slower steps on v5e - use only when memory-bound)
    remat: Any = False  # False/'none' | True/'full' | 'dots'
    # scan_blocks stacks the depth-identical blocks into one lax.scan:
    # ~depth-x smaller HLO (much faster XLA compiles) at identical math.
    # Param layout gains a leading (depth,) axis; utils/port.stack_blocks
    # converts between layouts.
    scan_blocks: bool = False

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @property
    def extras(self) -> int:
        return 1 if self.pad_cls_token else 0

    @property
    def decoder_extras(self) -> int:
        # reference: maskdit.py:285-289, 313-314
        if self.pad_cls_token and (not self.use_decoder or self.direct_cls_token):
            return 1
        return 0

    def setup(self) -> None:
        self.x_embedder = PatchEmbed(self.patch_size, self.hidden_size, dtype=self.dtype)
        self.t_embedder = TimestepEmbedder(self.hidden_size, dtype=self.dtype)
        if self.num_classes:
            self.y_embedder = LabelEmbedder(
                self.num_classes, self.hidden_size, dtype=self.dtype
            )
        if self.pad_cls_token:
            self.cls_token = self.param(
                "cls_token", normal_002, (1, 1, self.hidden_size)
            )
        if self.ext_feature_dim > 0:
            self.feat_embedder = nn.Dense(
                self.hidden_size, kernel_init=normal_002, dtype=self.dtype
            )
        if self.remat in (True, "full"):
            block_cls = nn.remat(DiTBlock)
        elif self.remat == "dots":
            block_cls = nn.remat(
                DiTBlock, policy=jax.checkpoint_policies.checkpoint_dots
            )
        elif self.remat == "names":
            # keep every GEMM's input and output (tagged in the block):
            # bwd recomputes only LN/modulate/softmax/gelu elementwise
            # chains — no GEMM reruns, smaller footprint than XLA's
            # default keep-set. Named-value policy also sidesteps the env
            # bug where checkpoint_dots crashes the AOT compiler.
            block_cls = nn.remat(
                DiTBlock,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "h_msa", "qkv_out", "attn_out",
                    "h_mlp", "fc1_out", "mlp_out",
                ),
            )
        elif self.remat == "names_lite":
            # memory-lean variant: ~4 activations/block kept; backward
            # re-runs the qkv and fc1 GEMMs (~+15% bwd FLOPs) in exchange
            # for fitting much larger batches, which amortize the
            # per-parameter optimizer+EMA tail over more images.
            block_cls = nn.remat(
                DiTBlock,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "h_msa", "attn_out", "h_mlp", "mlp_out",
                ),
            )
        else:
            block_cls = DiTBlock
        if self.scan_blocks:
            self.blocks = ScannedBlocks(
                block_cls, self.depth, self.hidden_size, self.hidden_size,
                self.num_heads, self.mlp_ratio, self.dtype, self.use_flash,
                name="blocks",
            )
        else:
            self.blocks = [
                block_cls(
                    self.hidden_size, self.hidden_size, self.num_heads,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                    use_flash=self.use_flash,
                )
                for _ in range(self.depth)
            ]
        final_hidden_size = self.hidden_size
        if self.use_decoder:
            self.decoder_layer = DecoderLayer(
                self.hidden_size, DECODER_HIDDEN_SIZE, dtype=self.dtype
            )
            if self.scan_blocks:
                self.decoder_blocks = ScannedBlocks(
                    block_cls, DECODER_DEPTH, DECODER_HIDDEN_SIZE,
                    self.hidden_size, DECODER_NUM_HEADS, self.mlp_ratio,
                    self.dtype, self.use_flash, name="decoder_blocks",
                )
            else:
                self.decoder_blocks = [
                    block_cls(
                        DECODER_HIDDEN_SIZE, self.hidden_size,
                        DECODER_NUM_HEADS, mlp_ratio=self.mlp_ratio,
                        dtype=self.dtype, use_flash=self.use_flash,
                    )
                    for _ in range(DECODER_DEPTH)
                ]
            if self.mae_loss_coef > 0:
                # learned mask token exists only with the MAE aux loss
                # (reference: maskdit.py:323-324)
                self.mask_token = self.param(
                    "mask_token", normal_002, (1, 1, DECODER_HIDDEN_SIZE)
                )
            if self.pad_cls_token:
                self.cls_token_embedder = nn.Dense(
                    self.hidden_size, kernel_init=normal_002, dtype=self.dtype
                )
            if self.use_encoder_feat:
                self.enc_feat_embedder = nn.Dense(
                    self.hidden_size, kernel_init=normal_002, dtype=self.dtype
                )
            final_hidden_size = DECODER_HIDDEN_SIZE
        self.final_layer = FinalLayer(
            final_hidden_size, self.hidden_size, self.patch_size,
            self.out_channels, dtype=self.dtype,
        )

    # -- fixed positional tables (recomputed, not stored as params) --------
    def _pos_embed(self) -> jax.Array:
        grid = self.input_size // self.patch_size
        tab = get_2d_sincos_pos_embed(
            self.hidden_size, grid, cls_token=self.pad_cls_token,
            extra_tokens=self.extras,
        )
        return jnp.asarray(tab)[None]

    def _decoder_pos_embed(self) -> jax.Array:
        grid = self.input_size // self.patch_size
        tab = get_2d_sincos_pos_embed(
            DECODER_HIDDEN_SIZE, grid, cls_token=self.pad_cls_token,
            extra_tokens=self.decoder_extras,
        )
        return jnp.asarray(tab)[None]

    # -- pieces -------------------------------------------------------------
    @staticmethod
    def _run_blocks(blocks, x: jax.Array, c: jax.Array,
                    kv_valid: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(blocks, ScannedBlocks):
            return blocks(x, c, kv_valid)
        for block in blocks:
            x = block(x, c, kv_valid)
        return x

    def _condition(self, t: jax.Array, y: Optional[jax.Array],
                   feat: Optional[jax.Array]) -> jax.Array:
        """c = t_emb + y_emb (+ feat_emb) (reference: maskdit.py:491-504)."""
        c = self.t_embedder(t)
        if self.num_classes and y is not None:
            c = c + self.y_embedder(y)
        if self.ext_feature_dim > 0 and feat is not None:
            c = c + self.feat_embedder(feat.astype(self.dtype))
        elif self.use_encoder_feat and self.use_decoder and feat is not None \
                and feat.shape[-1] == self.hidden_size:
            c = c + self.enc_feat_embedder(feat.astype(self.dtype))
        return c

    def _embed_and_mask(
        self, x: jax.Array, mask_ratio: float,
        mask_info: Optional[masking.MaskInfo], train: bool,
    ) -> tuple[jax.Array, Optional[masking.MaskInfo]]:
        pos = self._pos_embed()
        x = self.x_embedder(x) + pos[:, self.extras:, :].astype(self.dtype)
        if mask_ratio > 0 and mask_info is None:
            rng = self.make_rng("mask")
            mask_info = masking.random_mask(rng, x.shape[0], x.shape[1], mask_ratio)
        if mask_ratio > 0 and train:
            # at inference the mask is ignored even if provided
            # (reference: maskdit.py:479-483)
            x = masking.gather_tokens(x, mask_info.ids_keep)
        if self.pad_cls_token:
            cls = (self.cls_token + pos[:, : self.extras, :]).astype(self.dtype)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[2])), x], axis=1
            )
        return x, mask_info

    def _kv_valid(self, mask_info: Optional[masking.MaskInfo],
                  train: bool, mask_ratio: float) -> Optional[jax.Array]:
        """Valid-prefix length for pad-to-max masking (None = all valid)."""
        if (
            train and mask_ratio > 0 and mask_info is not None
            and mask_info.len_keep is not None
        ):
            return mask_info.len_keep + self.extras
        return None

    def encode(
        self, x: jax.Array, t: jax.Array, y: Optional[jax.Array],
        mask_ratio: float = 0.0, mask_info: Optional[masking.MaskInfo] = None,
        feat: Optional[jax.Array] = None, train: bool = False,
    ) -> tuple[jax.Array, Optional[masking.MaskInfo]]:
        """Pooled encoder feature for self-conditioning (reference: :426-464)."""
        x, mask_info = self._embed_and_mask(x, mask_ratio, mask_info, train=True)
        kv_valid = self._kv_valid(mask_info, train=True, mask_ratio=mask_ratio)
        c = self._condition(t, y, feat)
        x = self._run_blocks(self.blocks, x, c, kv_valid)
        body = x[:, self.extras:, :]
        if kv_valid is not None:
            # masked mean: padded-tail tokens carry garbage
            len_keep = mask_info.len_keep
            valid = (jnp.arange(body.shape[1]) < len_keep)[None, :, None]
            x_feat = jnp.sum(body * valid, axis=1) / len_keep
        else:
            x_feat = jnp.mean(body, axis=1)
        return layer_norm_no_affine(x_feat), mask_info

    def forward_encoder(
        self, x: jax.Array, t: jax.Array, y: Optional[jax.Array] = None,
        mask_ratio: float = 0.0, mask_info: Optional[masking.MaskInfo] = None,
        feat: Optional[jax.Array] = None, train: bool = True,
    ) -> tuple[dict, jax.Array, Optional[masking.MaskInfo]]:
        """Encoder tokens + conditioning (reference: maskdit.py:467-509).

        Returns (out_enc dict with 'x', c, mask_info) like the reference.
        """
        x_tok, mask_info = self._embed_and_mask(x, mask_ratio, mask_info, train)
        kv_valid = self._kv_valid(mask_info, train, mask_ratio)
        c = self._condition(t, y, feat)
        x_tok = self._run_blocks(self.blocks, x_tok, c, kv_valid)
        return {"x": x_tok}, c, mask_info

    def __call__(
        self, x: jax.Array, t: jax.Array, y: Optional[jax.Array] = None,
        mask_ratio: float = 0.0, mask_info: Optional[masking.MaskInfo] = None,
        feat: Optional[jax.Array] = None, train: bool = False,
    ) -> dict:
        """Full forward (reference: DiT.forward, maskdit.py:511-557)."""
        out: dict = {}
        if (not train) and self.use_encoder_feat and feat is None:
            feat, _ = self.encode(x, t, y)
        enc_out, c, mask_info = self.forward_encoder(
            x, t, y, mask_ratio=mask_ratio, mask_info=mask_info,
            feat=feat, train=train,
        )
        x_tok = enc_out["x"]

        if mask_ratio > 0:
            out["mask"] = mask_info.mask

        if self.use_decoder:
            if self.pad_cls_token:
                cls_out = x_tok[:, 0, :]
                c = c + self.cls_token_embedder(layer_norm_no_affine(cls_out))
            diff_extras = self.extras - self.decoder_extras
            x_tok = self.decoder_layer(x_tok[:, diff_extras:, :], c)
            if train and mask_ratio > 0:
                mask_token = (
                    self.mask_token if self.mae_loss_coef > 0
                    else jnp.zeros((1, 1, x_tok.shape[2]), x_tok.dtype)
                )
                if mask_info.len_keep is not None:
                    x_tok = masking.scatter_tokens_padded(
                        x_tok, mask_info.ids_restore, mask_token,
                        mask_info.len_keep, extras=self.decoder_extras,
                    )
                else:
                    x_tok = masking.scatter_tokens(
                        x_tok, mask_info.ids_restore, mask_token,
                        extras=self.decoder_extras,
                    )
            x_tok = x_tok + self._decoder_pos_embed().astype(self.dtype)
            x_tok = self._run_blocks(self.decoder_blocks, x_tok, c)

        x_tok = self.final_layer(x_tok, c)
        if not self.use_decoder and train and mask_ratio > 0:
            zero_tok = jnp.zeros((1, 1, x_tok.shape[2]), x_tok.dtype)
            if mask_info.len_keep is not None:
                x_tok = masking.scatter_tokens_padded(
                    x_tok, mask_info.ids_restore, zero_tok,
                    mask_info.len_keep, extras=self.extras,
                )
            else:
                x_tok = masking.scatter_tokens(
                    x_tok, mask_info.ids_restore, zero_tok, extras=self.extras
                )
        x_tok = x_tok[:, self.decoder_extras:, :]
        out["x"] = self.unpatchify(x_tok)
        return out

    def forward_with_cfg(
        self, x: jax.Array, t: jax.Array, y: jax.Array, cfg_scale: float,
        feat: Optional[jax.Array] = None,
    ) -> dict:
        """CFG double-batch forward (reference: maskdit.py:559-587).

        The conditional half uses y; the unconditional half uses the zero
        label vector (null class under the Linear-on-one-hot embedder).
        Guidance is applied to the first in_channels channels only, as the
        reference does for reproducibility (maskdit.py:578-581).
        """
        half = x
        combined = jnp.concatenate([half, half], axis=0)
        y_full = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
        t_full = jnp.concatenate([t, t], axis=0) if t.shape[0] == x.shape[0] else t
        if feat is not None:
            feat = jnp.concatenate([feat, feat], axis=0)
        model_out = self(combined, t_full, y_full, feat=feat, train=False)["x"]
        eps, rest = model_out[:, : self.in_channels], model_out[:, self.in_channels:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        half_rest = rest[: rest.shape[0] // 2]
        return {"x": jnp.concatenate([half_eps, half_rest], axis=1)}

    def unpatchify(self, x: jax.Array) -> jax.Array:
        """(N, L, p*p*C) -> (N, C, H, W) (reference: maskdit.py:411-424)."""
        c = self.out_channels
        p = self.patch_size
        n, l, _ = x.shape
        h = w = int(round(l ** 0.5))
        assert h * w == l, f"token count {l} is not a square"
        x = x.reshape(n, h, w, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(n, c, h * p, w * p)


# -- model registry (reference: maskdit.py:649-715) --------------------------

DIT_CONFIGS = {
    "DiT-H/2": dict(depth=32, hidden_size=1280, patch_size=2, num_heads=16),
    "DiT-H/4": dict(depth=32, hidden_size=1280, patch_size=4, num_heads=16),
    "DiT-H/8": dict(depth=32, hidden_size=1280, patch_size=8, num_heads=16),
    "DiT-XL/2": dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "DiT-XL/4": dict(depth=28, hidden_size=1152, patch_size=4, num_heads=16),
    "DiT-XL/8": dict(depth=28, hidden_size=1152, patch_size=8, num_heads=16),
    "DiT-L/2": dict(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "DiT-L/4": dict(depth=24, hidden_size=1024, patch_size=4, num_heads=16),
    "DiT-L/8": dict(depth=24, hidden_size=1024, patch_size=8, num_heads=16),
    "DiT-B/2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "DiT-B/4": dict(depth=12, hidden_size=768, patch_size=4, num_heads=12),
    "DiT-B/8": dict(depth=12, hidden_size=768, patch_size=8, num_heads=12),
    "DiT-S/2": dict(depth=12, hidden_size=384, patch_size=2, num_heads=6),
    "DiT-S/4": dict(depth=12, hidden_size=384, patch_size=4, num_heads=6),
    "DiT-S/8": dict(depth=12, hidden_size=384, patch_size=8, num_heads=6),
}


def create_dit(model_type: str, **kwargs) -> MaskDiT:
    """Build a MaskDiT from a registry name (reference: DiT_models)."""
    if model_type not in DIT_CONFIGS:
        raise KeyError(
            f"unknown model type '{model_type}' (known: {sorted(DIT_CONFIGS)})"
        )
    cfg = dict(DIT_CONFIGS[model_type])
    cfg.update(kwargs)
    return MaskDiT(**cfg)
