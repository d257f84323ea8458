"""Unified Orbax checkpointing.

The reference has THREE overlapping checkpoint paths (SURVEY §5.4):
inline torch.save dicts (training_pipeline.py:801-831), a CheckpointManager
class (checkpoint_manager.py:22-581), and gzip emergency backups
(backup_handler.py:236-455). Here there is ONE: an Orbax-backed manager
with best/periodic/latest policies, rotation, JSON metadata (config,
vocabulary, metrics), partial loads with shape-mismatch filtering, and an
`emergency_save` used by the resource monitor.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vivqa_tpu.config.base import ConfigBase


@dataclasses.dataclass(frozen=True)
class CheckpointConfig(ConfigBase):
    directory: str = "checkpoints"
    max_to_keep: int = 3
    save_interval_steps: int = 0          # 0 = only explicit saves
    keep_best: bool = True
    best_metric: str = "vqa_accuracy"     # metadata key to rank by
    best_mode: str = "max"                # max | min


class CheckpointManager:
    """Saves {state: pytree, metadata: json} per step."""

    def __init__(self, config: CheckpointConfig):
        self.config = config
        directory = Path(config.directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=config.max_to_keep,
            best_fn=(lambda m: m.get(config.best_metric, 0.0))
            if config.keep_best else None,
            best_mode=config.best_mode if config.keep_best else "max",
            create=True)
        self._mgr = ocp.CheckpointManager(str(directory), options=options)

    def save(self, step: int, state, metadata: Optional[Dict[str, Any]] = None,
             metrics: Optional[Dict[str, float]] = None, force: bool = False) -> bool:
        """state: any pytree (e.g. {'params':..., 'opt_state':..., 'rng':...})."""
        metadata = dict(metadata or {})
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        metadata["metrics"] = metrics
        saved = self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metadata=ocp.args.JsonSave(metadata)),
            metrics=metrics or None,
            force=force)
        self._mgr.wait_until_finished()
        return bool(saved)

    # -- queries ----------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    # -- loading ----------------------------------------------------------
    def restore(self, step: Optional[int] = None, target=None):
        """Restore (state, metadata). target (optional) gives structure/
        shardings for the state pytree."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints in {self.config.directory}")
        restore_args = (ocp.args.StandardRestore(target)
                        if target is not None else ocp.args.StandardRestore())
        out = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=restore_args, metadata=ocp.args.JsonRestore()))
        return out["state"], out["metadata"]

    def restore_best(self, target=None):
        step = self.best_step()
        if step is None:
            step = self.latest_step()
        return self.restore(step, target)

    def close(self):
        self._mgr.close()


def partial_load(restored_params, target_params, logger=None):
    """Merge restored params into target, skipping shape mismatches
    (reference strict/partial load, checkpoint_manager.py:403-492)."""
    flat_r = dict(_flatten(restored_params))
    out = []
    skipped = []
    flat_t = _flatten(target_params)
    for path, leaf in flat_t:
        r = flat_r.get(path)
        if r is not None and tuple(np.shape(r)) == tuple(np.shape(leaf)):
            out.append(r)
        else:
            out.append(leaf)
            if r is not None:
                skipped.append(f"{path}: ckpt{np.shape(r)} != "
                               f"model{np.shape(leaf)}")
    if skipped and logger is not None:
        logger.warning("partial load skipped %d params: %s",
                       len(skipped), skipped[:5])
    treedef = jax.tree_util.tree_structure(target_params)
    return jax.tree_util.tree_unflatten(treedef, out), skipped


def _flatten(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        out.append((path, leaf))
    return out


def emergency_save(state, directory: str | Path, metadata=None) -> Path:
    """One-shot synchronous save for the resource-monitor critical path
    (reference BackupHandler emergency backup, backup_handler.py:620-735)."""
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / "emergency"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if metadata:
        import json
        (path / "metadata.json").parent.mkdir(parents=True, exist_ok=True)
        (path / "metadata.json").write_text(json.dumps(metadata, default=str))
    return path
