"""Sharded checkpointing with optimizer state, rotation, and partial restore.

Upgrades the reference's checkpoint story (SURVEY.md §5): the reference saves
weights+step only via torch.save (ttts/gpt/train_ms.py:131-140), rotates with
clean_checkpoints keep-N (ttts/utils/utils.py:166-185), and supports
module-filtered restore (ttts/utils/checkpoint.py:64-103). Here:

* orbax CheckpointManager — async-capable, sharding-aware (restores arrays
  straight onto their mesh placement), atomic, with built-in keep-N rotation;
* FULL TrainState (params + optimizer moments + mutable collections + step)
  is saved, so resume is exact, unlike the reference;
* `filter_restore` re-implements the module-filtered partial load for
  finetune-from-pretrain flows.
"""
from __future__ import annotations

import os
import re
from typing import Any, Iterable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax for TrainState pytrees."""

    def __init__(self, directory: str, keep: int = 3,
                 save_interval_steps: int = 1):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> bool:
        saved = self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        """Restore `step` (default: latest). `target` supplies the pytree
        structure + shardings (pass an abstract or concrete TrainState)."""
        step = int(step) if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if target is not None:
            abstract = jax.tree_util.tree_map(_abstractify, target)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> Iterable[int]:
        return self._mgr.all_steps()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _abstractify(x):
    if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    if isinstance(x, np.ndarray):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def filter_restore(restored_params: Any, init_params: Any,
                   include: Iterable[str] = (), exclude: Iterable[str] = ()):
    """Module-filtered partial restore (ttts/utils/checkpoint.py:26-103).

    Returns init_params overlaid with restored leaves whose '/'-joined path
    matches any `include` regex (all, when empty) and no `exclude` regex.
    Shape-mismatched leaves are skipped (kept from init) — the reference
    skips mismatches the same way.
    """
    inc = [re.compile(p) for p in include]
    exc = [re.compile(p) for p in exclude]

    flat_init = _flatten(init_params)
    flat_rest = _flatten(restored_params)
    out = {}
    for path, leaf in flat_init.items():
        cand = flat_rest.get(path)
        use = cand is not None
        if use and inc:
            use = any(p.search(path) for p in inc)
        if use and any(p.search(path) for p in exc):
            use = False
        if use and hasattr(cand, "shape") and hasattr(leaf, "shape") \
                and cand.shape != leaf.shape:
            use = False
        out[path] = cand if use else leaf
    return _unflatten(out)


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    else:
        flat[prefix.rstrip("/")] = tree
    return flat


def _unflatten(flat):
    out: dict = {}
    for path, leaf in flat.items():
        keys = path.split("/")
        cur = out
        for k in keys[:-1]:
            cur = cur.setdefault(k, {})
        cur[keys[-1]] = leaf
    return out
