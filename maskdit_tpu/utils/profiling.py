"""Profiling & observability helpers (SURVEY.md §5 tracing row).

The reference's observability is wall-clock steps/sec plus peak GPU memory
prints (reference: train.py:240-249). Here:

  * ``model_train_flops`` — analytic FLOPs of one masked training step, for
    MFU reporting (flops model: 2*M*N*K per matmul, backward = 2x forward).
  * ``device_memory_stats`` — HBM usage from the local device.
  * ``trace`` — context manager around jax.profiler for on-demand traces.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax

V5E_PEAK_BF16_TFLOPS = 197.0


def dit_forward_flops(
    depth: int,
    hidden: int,
    seq_len: int,
    mlp_ratio: float = 4.0,
    decoder_depth: int = 0,
    decoder_hidden: int = 512,
    decoder_seq_len: Optional[int] = None,
) -> float:
    """Per-sample forward FLOPs of the transformer blocks (matmuls only)."""

    def block_flops(l: int, d: int) -> float:
        qkv = 2 * l * d * 3 * d
        attn = 2 * 2 * l * l * d
        proj = 2 * l * d * d
        mlp = 2 * 2 * l * d * int(d * mlp_ratio)
        ada = 2 * d * 6 * d  # per sample (c is (D,))
        return qkv + attn + proj + mlp + ada

    total = depth * block_flops(seq_len, hidden)
    if decoder_depth:
        total += decoder_depth * block_flops(
            decoder_seq_len or seq_len, decoder_hidden
        )
    return float(total)


def maskdit_train_flops_per_image(
    model_type: str = "DiT-XL/2",
    input_size: int = 32,
    mask_ratio: float = 0.5,
    use_decoder: bool = True,
) -> float:
    """Analytic train-step FLOPs/image (fwd + 2x for backward)."""
    from maskdit_tpu.models.dit import DIT_CONFIGS

    cfg = DIT_CONFIGS[model_type]
    l_full = (input_size // cfg["patch_size"]) ** 2
    l_enc = int(l_full * (1 - mask_ratio))
    fwd = dit_forward_flops(
        cfg["depth"], cfg["hidden_size"], l_enc,
        decoder_depth=8 if use_decoder else 0,
        decoder_seq_len=l_full,
    )
    return 3.0 * fwd


def maskdit_sample_flops_per_image(
    model_type: str = "DiT-XL/2",
    input_size: int = 32,
    num_steps: int = 40,
    cfg_scale: float = 1.5,
    use_decoder: bool = True,
) -> float:
    """Analytic FLOPs per SAMPLED image for the Heun EDM sampler.

    The Heun loop runs ``2*num_steps - 1`` model evaluations (an Euler
    plus a correction eval per step, none on the last — reference
    sample.py:30-66), each an UNMASKED forward; classifier-free guidance
    (cfg_scale != 1) doubles every eval's batch (forward_with_cfg,
    reference models/maskdit.py:570-587). Sampling MFU must count those
    executed FLOPs: the naive "one forward per step" accounting
    understates utilization ~4x (40 steps vs 79 evals x 2 CFG) — the
    source of the earlier 35%-MFU misread of a ~74%-MFU sampler.
    """
    from maskdit_tpu.models.dit import DIT_CONFIGS

    cfg = DIT_CONFIGS[model_type]
    l_full = (input_size // cfg["patch_size"]) ** 2
    fwd = dit_forward_flops(
        cfg["depth"], cfg["hidden_size"], l_full,
        decoder_depth=8 if use_decoder else 0,
        decoder_seq_len=l_full,
    )
    evals = 2 * num_steps - 1
    return float(fwd * evals * (2.0 if cfg_scale != 1.0 else 1.0))


def mfu(images_per_sec: float, flops_per_image: float,
        peak_tflops: float = V5E_PEAK_BF16_TFLOPS) -> float:
    """Model FLOPs utilization in [0, 1]."""
    return images_per_sec * flops_per_image / (peak_tflops * 1e12)


def device_memory_stats(device: Optional[Any] = None) -> dict[str, float]:
    """HBM stats in GiB (reference: peak-memory prints, train.py:248-249)."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        return {}
    gib = 1024 ** 3
    out = {}
    for key, name in (
        ("bytes_in_use", "mem_in_use_gib"),
        ("peak_bytes_in_use", "mem_peak_gib"),
        ("bytes_limit", "mem_limit_gib"),
    ):
        if key in stats:
            out[name] = stats[key] / gib
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
