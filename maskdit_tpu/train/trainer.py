"""Config-driven training loop (the reference train.py:35-291 equivalent).

Differences from the reference, by TPU design:
  * one jitted train step fuses reparam/dropout/loss/opt/EMA — no host
    round-trips except at log boundaries;
  * schedule-varying mask ratios are bucketed (train/schedules.py) and each
    distinct ratio gets its own compiled step, cached;
  * checkpoints are sharded orbax saves (async), not rank-0 torch.save;
  * resume state includes EMA + optimizer exactly like the reference's
    {model, ema, opt} dict (train.py:259-268).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskdit_tpu.data.datasets import (
    ImageNetLatentDataset,
    SyntheticLatentDataset,
)
from maskdit_tpu.data.loader import DataLoader, prefetch
from maskdit_tpu.models.precond import create_model
from maskdit_tpu.parallel import (
    batch_sharding,
    create_mesh,
    is_main_process,
    mprint,
)
from maskdit_tpu.parallel.sharded import (
    create_sharded_state,
    make_sharded_train_step,
)
from maskdit_tpu.train.schedules import (
    bucket_ratio,
    get_mask_ratio_fn,
    lr_with_rampup,
)
from maskdit_tpu.train.state import make_optimizer
from maskdit_tpu.utils.ckpt import CheckpointManager, graft_params, load_reference_checkpoint
from maskdit_tpu.utils.logging import MetricLogger, Throughput
from maskdit_tpu.utils.profiling import (
    device_memory_stats,
    maskdit_train_flops_per_image,
    mfu,
)


def build_dataset(config) -> Any:
    data = config.data
    category = data.get("category", "lmdb")
    if category == "synthetic":
        return SyntheticLatentDataset(
            length=data.get("length", 512),
            resolution=data.resolution,
            num_channels=data.num_channels,
            label_dim=config.model.num_classes,
        )
    if category == "lmdb":
        return ImageNetLatentDataset(
            data.root,
            resolution=data.resolution,
            num_channels=data.num_channels,
            xflip=config.train.get("xflip", False),
            feat_path=data.get("feat_path"),
            feat_dim=config.model.get("ext_feature_dim", 0),
            label_dim=config.model.num_classes,
        )
    if category in ("wds", "webdataset"):
        from maskdit_tpu.data.wds import WebDatasetLatents

        return WebDatasetLatents(
            data.root,
            resolution=data.resolution,
            num_channels=data.num_channels,
            label_dim=config.model.num_classes,
        )
    raise ValueError(f"unknown data.category '{category}'")


def default_use_flash(grad_accum: int, seq_len: int) -> Optional[bool]:
    """Measured default for the attention-kernel auto-dispatch.

    Short sequences (max L < 512, flash_batched's regime) lose to plain
    XLA attention under grad-accum memory pressure (256-res: 120x4 = 476
    vs 458 ms; 768x24 = 2734 vs 2547 even with bf16-mu headroom), so
    accumulating short-L configs default the kernel OFF. Long sequences
    (max L >= 512, flash_big's regime) win under accumulation too
    (512-res 512x32: 69.11 imgs/s vs 43.5 for XLA attention), so stay on
    auto. See STATUS.md for the sweeps."""
    return False if (grad_accum > 1 and seq_len < 512) else None


def experiment_name(config, global_batch: int) -> str:
    """Reference exp-dir naming (train.py:92-94)."""
    model_name = config.model.model_type.replace("/", "-")
    cond = "cond" if config.model.num_classes else "uncond"
    return (
        f"{model_name}-{config.model.precond}-{config.data.dataset}-{cond}"
        f"-m{config.model.mask_ratio}-de{int(config.model.use_decoder)}"
        f"-mae{config.model.mae_loss_coef}-bs-{global_batch}"
        f"-lr{config.train.lr}{config.log.get('tag', '')}"
    )


class Trainer:
    def __init__(
        self,
        config,
        results_dir: str = "results",
        seed: int = 0,
        ckpt_path: Optional[str] = None,
        use_wandb: bool = False,
        mesh_shape: Optional[dict] = None,
        num_workers: int = 2,
        max_steps_override: Optional[int] = None,
        eval_hook: Optional[Any] = None,
    ):
        # eval_hook(step, ema_params) -> dict of metrics; invoked after each
        # checkpoint (the reference's in-training FID eval, train.py:273-287)
        self.eval_hook = eval_hook
        self.config = config
        self.seed = seed
        self.mesh = create_mesh(mesh_shape)
        n_dev = int(np.prod(list(self.mesh.shape.values())))

        self.grad_accum = config.train.get("grad_accum", 1)
        per_dev_batch = config.train.batchsize
        self.global_batch = per_dev_batch * self.grad_accum * n_dev
        self.local_batch = self.global_batch // jax.process_count()

        self.max_steps = max_steps_override or config.train.max_num_steps
        self.mask_ratio_fn = get_mask_ratio_fn(
            config.model.get("mask_ratio_fn", "constant"),
            config.model.mask_ratio,
            config.model.get("mask_ratio_min", 0.0),
        )
        self.seq_len = (config.model.in_size // int(
            config.model.model_type.rsplit("/", 1)[1])) ** 2

        self.exp_name = experiment_name(config, self.global_batch)
        self.exp_dir = os.path.join(results_dir, self.exp_name)
        if is_main_process():
            os.makedirs(self.exp_dir, exist_ok=True)

        self.model = create_model(
            config.model.precond,
            img_resolution=config.model.in_size,
            img_channels=config.model.in_channels,
            num_classes=config.model.num_classes,
            model_type=config.model.model_type,
            use_decoder=config.model.use_decoder,
            mae_loss_coef=config.model.mae_loss_coef,
            pad_cls_token=config.model.get("pad_cls_token", False),
            ext_feature_dim=config.model.get("ext_feature_dim", 0),
            class_dropout_prob=config.model.get("class_dropout_prob", 0.1),
            dtype=jnp.float32 if config.train.get("fp32", False) else jnp.bfloat16,
            # an explicit model.use_flash wins; see default_use_flash
            use_flash=config.model.get(
                "use_flash", default_use_flash(self.grad_accum, self.seq_len)
            ),
        )
        # fused single-sweep Adam+EMA everywhere: the default 'jnp' mode is
        # one elementwise expression per leaf, so GSPMD partitions it over
        # fsdp/tensor-sharded params with zero gathers (grads, moments and
        # EMA share the params' sharding by construction — parallel/sharded
        # docstring; fused==staged equality on a {2,2,2} mesh is pinned by
        # tests/test_sharded_numerics.py::test_fused_adam_matches_staged_
        # on_sharded_mesh). Only the opt-in Pallas kernel mode is
        # replication-only (its (rows,128) reshape of a sharded leaf would
        # gather); make_optimizer guards that combination.
        self.fused_adam = bool(config.train.get("fused_adam", True))
        self.optimizer = make_optimizer(
            config.train.lr,
            global_batch_size=self.global_batch,
            rampup_kimg=config.train.get("lr_rampup_kimg", 0) or 0,
            fused=self.fused_adam,
            # train.moment_dtype: 'bfloat16' stores Adam mu narrower;
            # train.nu_dtype: 'bfloat16' stores Adam nu narrower with
            # stochastic rounding (fused-only). Both are opt-in
            # approximations; see the make_optimizer docstring.
            moment_dtype=config.train.get("moment_dtype", None),
            nu_dtype=config.train.get("nu_dtype", None),
        )
        # host-side mirror of the optimizer's LR schedule, for train/lr
        # logging (the reference logs it every round: train.py:252)
        _rampup = config.train.get("lr_rampup_kimg", 0) or 0
        _base_lr, _gbs = float(config.train.lr), self.global_batch
        self.lr_at = (
            (lambda s: float(lr_with_rampup(s, _base_lr, _gbs, _rampup)))
            if _rampup > 0 else (lambda s: _base_lr)
        )

        with self.mesh:
            self.state, self.shardings = create_sharded_state(
                self.model, jax.random.PRNGKey(seed), self.optimizer, self.mesh,
                batch_size=2, mask_ratio=config.model.mask_ratio or 0.5,
            )

        self.ckpt_mgr = CheckpointManager(
            os.path.join(self.exp_dir, "checkpoints"), max_to_keep=4
        )
        self.start_step = 0
        if ckpt_path is not None and ckpt_path.endswith(".pt"):
            # import a released torch checkpoint (finetune path)
            loaded = load_reference_checkpoint(ckpt_path, use_ema=False, strict=False)
            ema = load_reference_checkpoint(ckpt_path, use_ema=True, strict=False)
            params = graft_params(jax.device_get(self.state.params), loaded)
            ema_params = graft_params(jax.device_get(self.state.ema_params), ema)
            self.state = self.state.replace(
                params=jax.device_put(params, self.shardings.params),
                ema_params=jax.device_put(ema_params, self.shardings.ema_params),
            )
            mprint(f"imported reference checkpoint {ckpt_path}")
        elif self.ckpt_mgr.latest_step() is not None:
            abstract = jax.tree.map(lambda x: x, self.state)
            self.state = self.ckpt_mgr.restore(abstract)
            self.start_step = int(jax.device_get(self.state.step))
            mprint(f"resumed from step {self.start_step}")

        if config.data.get("streaming", False):
            # shard-sequential WDS streaming (data.streaming: true): whole
            # tars are read linearly per rank — the IO pattern network
            # storage needs (reference train_wds.py:35-42). Only the wds
            # category has a shard notion to stream.
            if config.data.get("category") not in ("wds", "webdataset"):
                raise ValueError(
                    "data.streaming requires data.category: wds"
                )
            from maskdit_tpu.data.wds import StreamingWDSLoader

            self.dataset = None
            self.loader = StreamingWDSLoader(
                config.data.root, self.local_batch,
                label_dim=config.model.num_classes, seed=seed,
                shuffle_buffer=config.data.get("shuffle_buffer", 1000),
                # reference train_wds.py --resample: shard-level iid draws
                # with replacement (nodesplitter disabled)
                resample=config.data.get("resampled", False),
            )
        else:
            self.dataset = build_dataset(config)
            self.loader = DataLoader(
                self.dataset, self.local_batch, shuffle=True, seed=seed,
                num_workers=num_workers,
                # reference train_wds.py --resample (iid shard/record
                # draws with replacement); here per-record with a
                # rank-disjoint stride
                resample=config.data.get("resampled", False),
            )
        self.metrics = MetricLogger(
            self.exp_dir,
            use_wandb=use_wandb,
            wandb_kwargs=dict(
                entity=config.get("wandb", {}).get("entity"),
                project=config.get("wandb", {}).get("project"),
                group=config.get("wandb", {}).get("group"),
            ) if use_wandb else None,
            config=config.to_container(),
        )

        self._step_cache: dict[float, Any] = {}

    @property
    def pad_to_max(self) -> bool:
        """One compiled step for all mask ratios (train.pad_to_max: true).

        Bucketed ratios recompile per distinct value — 5-15 min each through
        this environment's remote-compile tunnel, unusable for cosine
        finetune schedules (~32 buckets). Pad-to-max trades those compiles
        for running the encoder at the schedule's max kept-token count.
        """
        return bool(self.config.train.get("pad_to_max", False))

    def _mask_len_max(self) -> int:
        """Most tokens any schedule value keeps (probed on a progress grid)."""
        from maskdit_tpu.models.masking import len_keep_for

        min_ratio = min(
            float(self.mask_ratio_fn(i / 256.0)) for i in range(257)
        )
        return max(1, len_keep_for(self.seq_len, min_ratio))

    def _step_for_ratio(self, ratio: float):
        if self.pad_to_max:
            key = "padded"
            if key not in self._step_cache:
                self._step_cache[key] = make_sharded_train_step(
                    self.model, self.optimizer, self.mesh, self.shardings,
                    mask_ratio=0.5,  # unused gate; ratio rides the batch
                    mae_loss_coef=self.config.model.mae_loss_coef,
                    class_dropout_prob=self.config.model.get("class_dropout_prob", 0.1),
                    grad_accum=self.grad_accum,
                    pad_to_max=True,
                    mask_len_max=self._mask_len_max(),
                    amp_grads=self.config.train.get("amp_grads", False),
                    accum_dtype=self.config.train.get("accum_dtype", None),
                    ema_decay=self.config.train.get("ema_decay", 0.9999),
                    ema_every=self.config.train.get("ema_every", 1),
                )
            return self._step_cache[key]
        ratio = bucket_ratio(ratio, self.seq_len)
        if ratio not in self._step_cache:
            self._step_cache[ratio] = make_sharded_train_step(
                self.model, self.optimizer, self.mesh, self.shardings,
                mask_ratio=ratio,
                mae_loss_coef=self.config.model.mae_loss_coef,
                class_dropout_prob=self.config.model.get("class_dropout_prob", 0.1),
                grad_accum=self.grad_accum,
                amp_grads=self.config.train.get("amp_grads", False),
                accum_dtype=self.config.train.get("accum_dtype", None),
                # reference update_ema default decay=0.9999 (helper.py:48);
                # train.ema_decay overrides (short overfit runs need a
                # faster horizon — tools/overfit_gate.py)
                ema_decay=self.config.train.get("ema_decay", 0.9999),
                ema_every=self.config.train.get("ema_every", 1),
            )
        return self._step_cache[ratio]

    def train(self, log_every: Optional[int] = None, ckpt_every: Optional[int] = None):
        config = self.config
        log_every = log_every or config.log.log_every
        ckpt_every = ckpt_every or config.log.ckpt_every

        # Preemption-aware save: on SIGTERM/SIGINT finish the current step,
        # checkpoint, then exit cleanly so resume loses nothing (the
        # reference can only resume from its last periodic save).
        import signal

        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            mprint(f"signal {signum}: checkpointing and stopping...")
            stop_requested["flag"] = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:
                pass  # not the main thread
        rng = jax.random.PRNGKey(self.seed + 1)
        data_sharding = batch_sharding(self.mesh)
        throughput = Throughput()
        running = []
        step = self.start_step
        data_desc = (
            f"{len(self.dataset):,} samples" if self.dataset is not None
            else f"streaming {self.loader.num_shards} shards"
        )
        mprint(
            f"training {self.exp_name}: global batch {self.global_batch}, "
            f"{data_desc}, max {self.max_steps} steps"
        )

        with self.mesh:
            for batch in prefetch(iter(self.loader), data_sharding, size=2):
                if step >= self.start_step + self.max_steps or stop_requested["flag"]:
                    break
                progress = (step - self.start_step) / max(self.max_steps, 1)
                ratio = float(self.mask_ratio_fn(progress))
                step_fn = self._step_for_ratio(ratio)
                if self.config.model.get("ext_feature_dim", 0) == 0:
                    batch.pop("feat", None)
                if self.pad_to_max:
                    # replicated scalar rides the (pre-sharded) batch dict
                    batch["mask_ratio"] = jnp.asarray(ratio, jnp.float32)
                self.state, metrics = step_fn(self.state, batch, rng)
                step += 1
                running.append(metrics)
                throughput.update(1, self.global_batch)

                if step % log_every == 0:
                    stacked = jax.device_get(running)
                    avg = {
                        k: float(np.mean([m[k] for m in stacked]))
                        for k in stacked[0]
                    }
                    rates = throughput.rates()
                    try:
                        flops_img = maskdit_train_flops_per_image(
                            self.config.model.model_type,
                            self.config.model.in_size, ratio,
                            self.config.model.use_decoder,
                        )
                        util = mfu(rates["images_per_sec"], flops_img)
                    except Exception:
                        util = 0.0
                    mem = device_memory_stats()
                    mprint(
                        f"(step={step:07d}) loss={avg['loss']:.4f} "
                        f"steps/sec={rates['steps_per_sec']:.3f} "
                        f"imgs/sec={rates['images_per_sec']:.1f} "
                        f"mfu={util:.1%} mask_ratio={ratio:.3f} "
                        f"hbm={mem.get('mem_peak_gib', 0):.1f}GiB"
                    )
                    if is_main_process():
                        self.metrics.log(
                            {"train/loss": avg["loss"],
                             "train/lr": self.lr_at(step),
                             "train/grad_norm": avg.get("grad_norm", 0.0),
                             "train/steps_per_sec": rates["steps_per_sec"],
                             "train/images_per_sec": rates["images_per_sec"],
                             "train/mfu": util,
                             "train/mask_ratio": ratio,
                             **{f"train/{k}": v for k, v in mem.items()}},
                            step,
                        )
                    running = []
                    throughput.reset()

                if step % ckpt_every == 0:
                    self.ckpt_mgr.save(step, self.state)
                    mprint(f"checkpoint queued at step {step}")
                    if self.eval_hook is not None:
                        eval_metrics = self.eval_hook(step, self.state.ema_params)
                        mprint(f"(step={step:07d}) eval: {eval_metrics}")
                        if is_main_process() and eval_metrics:
                            self.metrics.log(
                                {f"eval/{k}": v for k, v in eval_metrics.items()},
                                step,
                            )
                        throughput.reset()

        if step not in self.ckpt_mgr.all_steps():
            self.ckpt_mgr.save(step, self.state, force=True)
        self.ckpt_mgr.wait()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
        mprint(f"training done at step {step}")
        return step
