"""Multi-host (multi-slice) helpers.

Single-slice data parallelism lives in parallel.data_parallel (ICI
collectives inside shard_map). Scaling past one host adds two needs
(SURVEY.md §2.3/§5 distributed plan):

1. runtime bring-up: `jax.distributed.initialize` before device queries
2. evaluation gather: VOC mAP is a host-side computation over ALL
   predictions, so per-host prediction rows must be gathered to process 0
   (the reference is single-process and has no equivalent; train.py:180-207
   accumulates rows in one Python list).

Everything here degrades gracefully to single-process no-ops, so the same
training script runs on one chip, one slice, or many slices.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime (DCN). No-op when env/args indicate a
    single process."""
    if num_processes in (None, 1) and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def is_primary() -> bool:
    return jax.process_index() == 0


def gather_meter_sums(meters) -> None:
    """Combine AverageMeter sums/counts across processes in place, so every
    host reports dataset-level mean losses (the single-host equivalent of the
    reference's val loss meters, train.py:183-191)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    keys = sorted(meters)
    local = np.asarray([[meters[k].sum, float(meters[k].count)]
                        for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)  # [P, K, 2]
    total = gathered.sum(axis=0)
    for i, k in enumerate(keys):
        m = meters[k]
        m.sum = float(total[i, 0])
        m.count = int(total[i, 1])
        m.average = m.sum / max(m.count, 1)


def gather_prediction_rows(rows: Sequence[Sequence[float]],
                           row_width: int = 7) -> List[List[float]]:
    """All-gather variable-length prediction rows to every host.

    rows: this host's [img_id, x0, y0, x1, y1, score, label] lists
    (evaluation.metrics.detections_to_pred_rows output). Uses a fixed-width
    padded device all-gather over the global device set (the TPU-native
    replacement for an MPI gather): each host contributes a
    [max_rows, row_width] block plus a validity count.
    """
    if jax.process_count() == 1:
        return [list(r) for r in rows]

    from jax.experimental import multihost_utils

    local = np.asarray(rows, np.float32).reshape(-1, row_width)
    n_local = np.int32(local.shape[0])
    max_rows = int(multihost_utils.process_allgather(n_local).max())
    padded = np.zeros((max_rows, row_width), np.float32)
    padded[:local.shape[0]] = local

    all_rows = multihost_utils.process_allgather(padded)   # [P, max, W]
    all_counts = multihost_utils.process_allgather(n_local)
    out: List[List[float]] = []
    for block, count in zip(all_rows, all_counts):
        out.extend(block[:int(count)].tolist())
    return out
