"""Batch image generation: seeds -> sampled latents -> VAE decode -> PNGs.

Reference: generate_with_net (sample.py:230-296). Per-seed determinism via
StackedRandomGenerator; seeds are rank-strided across hosts
(sample.py:232-235) so any world size produces the same 50K images.

The denoiser + sampler are jitted once per (batch_size, cfg) and reused for
every batch; the VAE decode runs in a separately jitted function with a
halving fallback mirroring the reference's recur_decode OOM retry
(sample.py:273-279).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from maskdit_tpu.models.precond import EDMPrecond
from maskdit_tpu.sampling.edm import ablation_sampler, edm_sampler
from maskdit_tpu.utils.rng import StackedRandomGenerator


@dataclass
class SamplerConfig:
    """Sampler options (reference CLI args, generate.py ~:320-340)."""

    num_steps: int = 40
    cfg_scale: Optional[float] = None
    S_churn: float = 0.0
    solver: Optional[str] = None
    discretization: Optional[str] = None
    schedule: Optional[str] = None
    scaling: Optional[str] = None
    extra: dict = field(default_factory=dict)

    @property
    def use_ablation(self) -> bool:
        return any(
            v is not None
            for v in (self.solver, self.discretization, self.schedule, self.scaling)
        )


def make_sample_fn(
    model: EDMPrecond,
    params: Any,
    cfg: SamplerConfig,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a jitted (latents, labels) -> denoised-latents function."""

    kwargs: dict = {"num_steps": cfg.num_steps, "S_churn": cfg.S_churn}
    # noise levels the net supports (reference sample.py:36-37,104-106,157;
    # identity for EDMPrecond — precond.py:32-33,121)
    kwargs.update(
        net_sigma_min=model.sigma_min,
        net_sigma_max=model.sigma_max,
        round_sigma=model.round_sigma,
    )
    kwargs.update(cfg.extra)

    if cfg.use_ablation:
        kwargs.update(
            solver=cfg.solver or "heun",
            discretization=cfg.discretization or "edm",
            schedule=cfg.schedule or "linear",
            scaling=cfg.scaling or "none",
        )
        sampler = ablation_sampler
    else:
        sampler = edm_sampler

    # params enter as an explicit jit argument: closure-captured arrays
    # would be inlined as HLO *constants* (hundreds of MB for real models).
    @jax.jit
    def sample(params, latents, labels, rng, feat):
        def denoise(x, sigma):
            return model.apply(
                {"params": params},
                x,
                jnp.full((x.shape[0],), sigma, jnp.float32),
                labels,
                cfg_scale=cfg.cfg_scale,
                feat=feat,
            )["x"]

        churn_rng = rng if cfg.S_churn > 0 else None
        return sampler(denoise, latents, rng=churn_rng, **kwargs)

    def bound(latents, labels, rng, feat=None):
        # feat: optional (B, ext_feature_dim) conditioning rows — the
        # reference samplers forward feat= to the net the same way
        # (sample.py:56,172); None is a zero-leaf pytree under jit.
        return sample(params, latents, labels, rng, feat)

    return bound


def _is_oom_error(exc: BaseException) -> bool:
    """True for device memory exhaustion; False for genuine bugs.

    The reference retries only on ``torch.cuda.OutOfMemoryError``
    (sample.py:273-279); the XLA analogue is a RESOURCE_EXHAUSTED
    XlaRuntimeError. Anything else must propagate immediately so shape/
    dtype bugs aren't retried five times with the real cause obscured.
    """
    msg = str(exc)
    return ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
            or "out of memory" in msg)


def decode_images(vae_apply: Callable, z: jax.Array, max_split: int = 4) -> np.ndarray:
    """VAE decode with OOM batch-halving retry (reference recur_decode)."""
    for split in range(max_split + 1):
        parts = 2 ** split
        if z.shape[0] % parts:
            continue
        try:
            chunks = [
                np.asarray(vae_apply(part))
                for part in np.split(np.asarray(z), parts)
            ]
            return np.concatenate(chunks)
        except Exception as exc:
            if split == max_split or not _is_oom_error(exc):
                raise
    raise RuntimeError("unreachable")


def resolve_class_outdir(
    label_dict_path: str, class_idx: int, results_dir: str
) -> tuple[str, str]:
    """Map a class index to its class-named sample folder.

    Reference generate.py:22-28: ``label_dict[str(class_idx)][1]`` is the
    human-readable class name; samples land in ``<results_dir>/<name>``.
    Returns (outdir, class_name).
    """
    import json

    with open(label_dict_path) as f:
        entry = json.load(f)[str(class_idx)]
    class_name = entry[1] if isinstance(entry, (list, tuple)) else str(entry)
    return os.path.join(results_dir, class_name), class_name


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1] NCHW float -> uint8 NHWC (reference: sample.py:287)."""
    arr = np.clip((images + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return arr.transpose(0, 2, 3, 1)


def save_images(
    images_np: np.ndarray, seeds: Sequence[int], outdir: str, subdirs: bool = False
) -> None:
    for seed, image_np in zip(seeds, images_np):
        image_dir = (
            os.path.join(outdir, f"{seed - seed % 1000:06d}") if subdirs else outdir
        )
        os.makedirs(image_dir, exist_ok=True)
        path = os.path.join(image_dir, f"{seed:06d}.png")
        if image_np.shape[2] == 1:
            Image.fromarray(image_np[:, :, 0], "L").save(path)
        else:
            Image.fromarray(image_np, "RGB").save(path)


def generate_with_params(
    model: EDMPrecond,
    params: Any,
    seeds: Sequence[int],
    outdir: Optional[str],
    sampler_cfg: SamplerConfig,
    vae_apply: Optional[Callable] = None,
    class_idx: Optional[int] = None,
    max_batch_size: int = 50,
    rank: int = 0,
    world: int = 1,
    subdirs: bool = False,
    save_latents: bool = False,
    feat_fn: Optional[Callable] = None,
) -> Optional[np.ndarray]:
    """Generate images for ``seeds``; returns stacked images if outdir None.

    Seed batching mirrors sample.py:232-235: split into equal batches, then
    rank-strided assignment.

    ``feat_fn(batch_seeds) -> (features (B, F), one-hot labels (B, K))``
    enables external-feature conditioning (models built with
    ext_feature_dim > 0): the retrieved labels REPLACE the per-seed random
    labels because a feature row and its class id come from the same
    training sample (reference retrieve_n_features, sample.py:192-227).
    """
    seeds = list(seeds)
    num_batches = (
        (len(seeds) - 1) // (max_batch_size * world) + 1
    ) * world
    all_batches = np.array_split(np.asarray(seeds), num_batches)
    rank_batches = all_batches[rank::world]

    sample_fn = make_sample_fn(model, params, sampler_cfg)
    res = model.img_resolution
    ch = model.img_channels
    collected = []

    def flush(pending) -> None:
        """Materialize a batch on the host and write it out.

        Runs AFTER the next batch's sampling has been enqueued, so PNG
        encoding/IO (and the host copy) overlap the device's 79-eval scan
        — the reference serializes decode behind sampling (sample.py:273).
        """
        batch_seeds, z, decoded = pending
        if decoded is not None:
            try:
                images_np = to_uint8(np.asarray(decoded))
            except Exception as exc:
                if not _is_oom_error(exc):
                    raise
                # whole-batch decode blew HBM: redo with halving retry
                images_np = to_uint8(decode_images(vae_apply, z))
        elif save_latents or outdir is None:
            images_np = np.asarray(z)
        else:
            raise ValueError("need a VAE to write PNGs; pass vae_apply")

        if outdir is None:
            collected.append(images_np)
        elif decoded is not None:
            save_images(images_np, batch_seeds, outdir, subdirs)
        else:
            os.makedirs(outdir, exist_ok=True)
            np.save(
                os.path.join(outdir, f"latents_{int(batch_seeds[0]):06d}.npy"),
                images_np,
            )

    pending = None
    for batch_seeds in rank_batches:
        if len(batch_seeds) == 0:
            continue
        g = StackedRandomGenerator(batch_seeds.tolist())
        latents = g.randn([len(batch_seeds), ch, res, res])
        if model.num_classes:
            labels_idx = g.randint(model.num_classes, size=[len(batch_seeds)])
            if class_idx is not None:
                labels_idx = jnp.full_like(labels_idx, class_idx)
            labels = jax.nn.one_hot(labels_idx, model.num_classes)
        else:
            labels = jnp.zeros((len(batch_seeds), 0))

        feat = None
        if feat_fn is not None:
            feat_np, labels_np = feat_fn(batch_seeds.tolist())
            feat = jnp.asarray(feat_np)
            labels = jnp.asarray(labels_np)

        rng = jax.random.PRNGKey(int(batch_seeds[0]))
        z = sample_fn(latents, labels, rng, feat)  # async dispatch
        decoded = vae_apply(z) if vae_apply is not None else None

        if pending is not None:
            flush(pending)  # host IO overlaps this batch's device work
        pending = (batch_seeds.tolist(), z, decoded)
    if pending is not None:
        flush(pending)

    if outdir is None and collected:
        return np.concatenate(collected)
    return None
