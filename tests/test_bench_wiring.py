"""Wiring tests for bench.py — the driver's headline entry point.

bench.py is normally exercised only on the real TPU chip, so a refactor
there (e.g. the r3 build()/run()/ladder_sweep dedup) has no CPU-side
safety net. These tests swap the flagship XL/2 for DiT-S/2 via the
MODEL hook and drive the exact build/run/mode code paths — every env
default (bf16 mu, amp grads, bf16 accumulator, seq-len flash policy)
included — on the CPU backend. They check wiring, not performance.
"""

import json
import sys

import jax
import pytest


@pytest.fixture()
def bench(monkeypatch, tiny_dit):
    import bench as mod
    from maskdit_tpu.utils.profiling import maskdit_train_flops_per_image

    monkeypatch.setattr(mod, "MODEL", "DiT-S/2")
    monkeypatch.setattr(
        mod,
        "TRAIN_FLOPS_PER_IMAGE",
        maskdit_train_flops_per_image("DiT-S/2", 32, 0.5, True),
    )
    return mod


def _fast(mod, monkeypatch):
    """Wrap bench.run so every mode executes 0 warmup + 1 timed iter."""
    orig = mod.run

    def wrapped(batch, grad_accum=1, **kw):
        kw["warmup"] = 0
        kw["iters"] = 1
        return orig(batch, grad_accum, **kw)

    monkeypatch.setattr(mod, "run", wrapped)


def _main_json(mod, monkeypatch, capsys, mode=None):
    argv = ["bench.py"] + (["--mode", mode] if mode else [])
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected ONE JSON line, got {out}"
    return json.loads(out[0])


def test_run_accum_defaults(bench):
    """Direct run() with grad_accum>1: exercises the bf16-mu default, amp
    grads, the bf16 accumulator, and the short-L kernel-off policy."""
    rate = bench.run(4, 2, warmup=0, iters=1, res=16)
    assert rate > 0


def test_main_train_mode_ladder_fallthrough(bench, monkeypatch, capsys):
    """Default mode end-to-end: a failing ladder rung falls through to the
    next one, and the output is one well-formed JSON line."""
    _fast(bench, monkeypatch)
    # 3x2: grad_accum does not divide the batch -> build() must fail ->
    # sweep falls to 4x2
    monkeypatch.setenv("MASKDIT_BENCH_BATCHES", "3x2,4x2")
    rec = _main_json(bench, monkeypatch, capsys)
    assert rec["metric"] == "maskdit_xl2_train_images_per_sec"
    assert rec["unit"] == "images/sec/chip"
    # vs_baseline is checked for CONSISTENCY, not positivity: on a loaded
    # 1-core box the single timed iter can run slow enough that
    # round(rate/273.5, 4) becomes 0.0 — a timing artifact, not a wiring
    # bug (observed 2026-08-19 under 3 concurrent pytest processes).
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(
        rec["value"] / bench.A100_IMAGES_PER_SEC, abs=1e-3
    )


def test_main_train512_mode(bench, monkeypatch, capsys):
    """train512 mode: res=64 latents thread through build()/run() (the
    r3 dedup replaced the separate run_512 builder)."""
    _fast(bench, monkeypatch)
    monkeypatch.setenv("MASKDIT_BENCH_512", "2x2")
    rec = _main_json(bench, monkeypatch, capsys, mode="train512")
    assert rec["metric"] == "maskdit_xl2_train512_images_per_sec"
    # consistency, not positivity — see test_main_train_mode_ladder_fallthrough
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(
        rec["value"] / bench.BASELINE_512_IMGS_PER_SEC, abs=1e-3
    )


def test_main_finetune256_mode(bench, monkeypatch, capsys):
    """finetune256 mode: mask_ratio=0.0 (full-length encoder) wiring."""
    _fast(bench, monkeypatch)
    monkeypatch.setenv("MASKDIT_BENCH_FT", "2")
    rec = _main_json(bench, monkeypatch, capsys, mode="finetune256")
    assert rec["metric"] == "maskdit_xl2_finetune256_images_per_sec"
    assert rec["value"] > 0 and rec["vs_baseline"] == 0.0


def test_main_train_io_mode(bench, monkeypatch, capsys):
    """train_io mode: synthetic latent LMDB -> real DataLoader ->
    prefetch -> jitted step, reporting loader-only and e2e rates."""
    orig = bench.run_train_io

    def small(batch, grad_accum=1, **kw):
        return orig(batch, grad_accum, iters=1, res=16, n_records=32)

    monkeypatch.setattr(bench, "run_train_io", small)
    monkeypatch.setenv("MASKDIT_BENCH_IO", "4x2")
    rec = _main_json(bench, monkeypatch, capsys, mode="train_io")
    assert rec["metric"] == "maskdit_xl2_train_io_images_per_sec"
    assert rec["value"] > 0 and rec["loader_only"] > 0


def test_ladder_sweep_exhausted_returns_none(bench, monkeypatch):
    monkeypatch.setenv("MASKDIT_TEST_LADDER", "notanumber,alsobad")
    assert bench.ladder_sweep("MASKDIT_TEST_LADDER", "", lambda b, ga: b) is None


def test_sampling_wiring(bench):
    """Sampler path builds + runs at a tiny shape (fwd-only scan)."""
    rate = bench.run_sampling(batch=2, num_steps=2, res=16)
    assert rate > 0
