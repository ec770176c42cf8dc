"""TensorBoard scalar logging (TRAIN.TENSORBOARD_LOG).

The reference logs lr and per-batch/per-epoch losses through mxboard when
TENSORBOARD_LOG is set (deepim/core/module.py:1096-1158), plus periodic
L2 norms of every weight (:1113-1122).  Here the same scalars go through
torch.utils.tensorboard when available; the logger degrades to a no-op so
training never depends on TensorBoard being installed.
"""
from __future__ import annotations

from typing import Any

import numpy as np


class TBLogger:
    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:  # tensorboard not installed: stay a no-op
            self._writer = None

    @property
    def enabled(self) -> bool:
        return self._writer is not None

    def scalars(self, metrics: dict[str, float], step: int, prefix: str = "train") -> None:
        if self._writer is None:
            return
        for name, value in metrics.items():
            self._writer.add_scalar(f"{prefix}/{name}", float(value), step)

    def weight_norms(self, params: Any, step: int) -> None:
        """Periodic L2 norm of every weight (module.py:1113-1122)."""
        if self._writer is None:
            return
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            self._writer.add_scalar(
                f"weights/{name}", float(np.linalg.norm(np.asarray(leaf).ravel())), step
            )

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
