"""Metric logging: JSONL always, wandb when available and enabled.

Metric names match the reference's wandb schema (train.py:282-290,
383-395) so dashboards translate directly: train/loss{,-position,-strain,
-x,-y[,-z]}, lr, val/loss{,-position,-strain}, val/rmse-oneStep,
val/runtime.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

try:  # wandb is optional in this environment
    import wandb  # type: ignore

    _HAS_WANDB = True
except Exception:  # pragma: no cover
    wandb = None
    _HAS_WANDB = False


class MetricLogger:
    def __init__(
        self,
        log_dir: str | Path,
        *,
        use_wandb: bool = False,
        project: str = "",
        run_name: str = "",
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.log_dir / "metrics.jsonl", "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb and _HAS_WANDB:
            self._wandb = wandb.init(project=project, name=run_name)

    def log(self, metrics: dict, step: int):
        record = {"step": step, "time": time.time() - self._t0}
        record.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            wandb.log(metrics, step=step)

    def close(self):
        self._file.close()
        if self._wandb is not None:
            wandb.finish()
