"""Checkpointing: orbax-backed save/restore with scope-regex partial restore.

Rebuild of the reference's three TF-Saver policies (train.py:81-120,169-171,
213-216; SURVEY.md §5):
- `saver_to_restore` with include/exclude scope lists for transfer learning
  (args.py:47-57)  -> `partial_restore`
- periodic `saver_to_save` and best-mAP `saver_best` -> `CheckpointStore`
  with descriptive names encoding epoch/step/loss/mAP
- `save_optimizer=False` + the offline optimizer-slot stripper
  (misc/remove_optimizers_params_in_ckpt.py) -> `save(..., include_opt=False)`
  and `strip_optimizer`
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointStore:
    """Directory of named checkpoints, one orbax tree each."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Dict[str, Any], *,
             include_opt: bool = True, overwrite: bool = True) -> str:
        """Save a {'params','batch_stats','opt_state','step',...} tree."""
        tree = dict(state)
        if not include_opt:
            tree.pop("opt_state", None)
        path = self.path(name)
        if overwrite and os.path.exists(path):
            # multi-host: rank 0 clears, everyone waits, then all processes
            # enter orbax save together (it coordinates internally)
            if jax.process_index() == 0:
                import shutil
                shutil.rmtree(path, ignore_errors=True)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices(f"ckpt_clear:{name}")
        self._ckptr.save(path, _to_host(tree))
        self._ckptr.wait_until_finished()
        return path

    def restore(self, name_or_path: str,
                target: Optional[Any] = None) -> Dict[str, Any]:
        """Restore a checkpoint tree. Pass `target` (a matching pytree of
        arrays) to restore custom container types (e.g. optax namedtuple
        states) with their original structure."""
        path = (name_or_path if os.path.isabs(name_or_path)
                else self.path(name_or_path))
        if target is not None:
            return self._ckptr.restore(path, _to_host(target))
        return self._ckptr.restore(path)

    def list(self) -> Sequence[str]:
        return sorted(
            d for d in os.listdir(self.directory)
            if os.path.isdir(os.path.join(self.directory, d)))

    def latest(self) -> Optional[str]:
        """Most recently *written* checkpoint (by directory mtime).

        Name ordering would be wrong here: 'model-epoch_9...' sorts after
        'model-epoch_10...' and periodic saves after best-mAP saves, so a
        lexicographic pick could auto-resume an older checkpoint.
        """
        names = self.list()
        if not names:
            return None
        return max(names, key=lambda n: os.path.getmtime(self.path(n)))


def _path_key(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def scope_filter(tree: Any, include: Optional[Sequence[str]],
                 exclude: Optional[Sequence[str]]) -> Any:
    """Boolean pytree selecting paths by scope prefix.

    Mirrors tf.contrib.framework.get_variables_to_restore(include, exclude)
    semantics (train.py:81): include=None selects everything; exclude wins
    over include.
    """
    def selected(key: str) -> bool:
        if include is not None and not any(
                key.startswith(p) or f"/{p}" in key for p in include):
            return False
        if exclude is not None and any(
                key.startswith(p) or f"/{p}" in key for p in exclude):
            return False
        return True

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(
        treedef, [selected(_path_key(path)) for path, _ in flat])


def partial_restore(current: Any, restored: Any,
                    include: Optional[Sequence[str]] = None,
                    exclude: Optional[Sequence[str]] = None) -> Any:
    """Merge `restored` into `current` for selected paths only.

    Equivalent of restoring with `saver_to_restore` while leaving excluded
    scopes at their fresh initialization (train.py:81 + args.py:47-57),
    e.g. exclude=("head/conv_6", "head/conv_14", "head/conv_22") keeps the
    class-count-dependent output convs re-initialized for fine-tuning.
    """
    mask = scope_filter(current, include, exclude)
    return jax.tree_util.tree_map(
        lambda take, cur, res: res if take else cur, mask, current, restored)


def strip_optimizer(state: Dict[str, Any]) -> Dict[str, Any]:
    """Drop optimizer slots from a training checkpoint
    (misc/remove_optimizers_params_in_ckpt.py parity)."""
    return {k: v for k, v in state.items() if k != "opt_state"}
