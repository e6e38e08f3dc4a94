"""Trainability-gate wiring (VERDICT r4 next #1).

The full gate (tools/overfit_gate.py, ~2000 steps) trains a small DiT to
memorize 8 latents and asserts EDM samples reproduce them — the in-box
proxy for the reference's train-to-FID validation (train.py:198-287).
The banked full-run verdict lives in STATUS.md round 5. These tests keep
the gate's machinery green in the default suite at token cost: a 2-step
run must produce a complete, well-formed verdict (and honestly fail).
"""

import json
import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_wiring_two_steps(tmp_path):
    from tools.overfit_gate import run_gate

    verdict = run_gate(
        steps=2, out=str(tmp_path), k=4, batch=8, lr=1e-3,
        num_sample_steps=2, mask_fn="constant",
    )
    for key in ("steps", "loss_start", "loss_end", "nn_match",
                "on_target_mse", "off_target_mse", "mse_ratio", "passed"):
        assert key in verdict, key
    assert verdict["steps"] == 2
    assert np.isfinite(verdict["loss_end"])
    assert np.isfinite(verdict["on_target_mse"])
    # 2 steps from init cannot memorize: the gate must not pass vacuously
    assert verdict["passed"] is False


def test_loader_fails_fast_on_undersized_epoch(tmp_path):
    """The hang the gate found: batch > samples/rank spins forever through
    empty epochs; DataLoader must raise instead."""
    from maskdit_tpu.data.datasets import SyntheticLatentDataset
    from maskdit_tpu.data.loader import DataLoader

    ds = SyntheticLatentDataset(length=8, resolution=8, num_channels=4,
                                label_dim=4)
    loader = DataLoader(ds, batch_size=32, num_workers=1)
    with pytest.raises(ValueError, match="no full batch"):
        next(iter(loader))
