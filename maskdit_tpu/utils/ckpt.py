"""Checkpointing: async Orbax manager + reference-checkpoint import.

The reference saves ``{model, ema, opt, args}`` as ``NNNNNNN.pt`` on rank 0
every ckpt_every steps and resumes from the latest by filename scan
(reference: train.py:259-271, utils.py:22-34). Here:

  * ``CheckpointManager`` wraps orbax's async manager: sharded-aware saves
    (every host writes its shards), step-numbered directories, retention,
    preemption-friendly (save is non-blocking; ``wait`` before exit).
  * ``latest_step`` / restore replace the filename-regex scan.
  * ``load_reference_checkpoint`` imports the released torch ``.pt`` files
    through maskdit_tpu.utils.port for FID-parity evaluation.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    """Orbax-backed train-state checkpointing."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Async save; returns True if a save was started."""
        return self._mgr.save(
            int(step), args=self._ocp.args.StandardSave(state), force=force
        )

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the sharding/structure of ``abstract_state``."""
        step = self.latest_step() if step is None else int(step)
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(abstract_state)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def get_latest_ckpt_dir(results_dir: str) -> Optional[str]:
    """Newest orbax step dir under results_dir/checkpoints, if any."""
    d = os.path.join(results_dir, "checkpoints")
    if not os.path.isdir(d):
        return None
    steps = [int(s) for s in os.listdir(d) if s.isdigit()]
    return os.path.join(d, str(max(steps))) if steps else None


def load_reference_checkpoint(
    path: str, use_ema: bool = True, strict: bool = True
) -> dict:
    """Released reference ``.pt`` -> flax param tree for our EDMPrecond.

    use_ema selects ckpt['ema'] (what the reference evaluates,
    generate.py:46); otherwise ckpt['model']. With strict=False, missing
    mask-token keys (unmasked finetunes, README.md:105) are tolerated by
    the converter's absence — the caller grafts defaults.
    """
    from maskdit_tpu.utils import port

    key = "ema" if use_ema else "model"
    state = port.load_torch_state_dict(path, key=key)
    try:
        return port.convert_maskdit(state)
    except KeyError as e:
        if strict:
            has_decoder = any(k.startswith("model.decoder_") for k in state)
            raise KeyError(
                f"{e} while importing {path}. If the model-flag mismatch is "
                f"the cause: this checkpoint {'DOES' if has_decoder else 'does NOT'} "
                "contain decoder weights (match --use_decoder / "
                "--mae_loss_coef), or pass strict=False / "
                "--use_strict_load False to drop unknown keys."
            ) from e
        # drop unknown keys and retry
        known = {}
        for k, v in state.items():
            try:
                port.convert_maskdit({k: v})
                known[k] = v
            except KeyError:
                continue
        return port.convert_maskdit(known)


def graft_params(target: Any, loaded: dict) -> Any:
    """Overlay ``loaded`` onto a freshly-initialized param tree.

    Non-strict load (reference: train.py:150-151 use_strict_load=False):
    params present in ``loaded`` replace the target's; shapes must match.
    """
    import jax.tree_util as jtu

    def merge(tgt: Any, src: Any, path: str = ""):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                out[k] = merge(v, src.get(k) if isinstance(src, dict) else None,
                               f"{path}/{k}")
            return out
        if src is None:
            return tgt
        src = np.asarray(src)
        if tuple(src.shape) != tuple(tgt.shape):
            raise ValueError(
                f"shape mismatch at {path}: ckpt {src.shape} vs model {tgt.shape}"
            )
        return src.astype(np.asarray(tgt).dtype)

    del jtu
    return merge(target, loaded)
