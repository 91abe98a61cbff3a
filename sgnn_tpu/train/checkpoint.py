"""Best-only checkpointing with resume (orbax-backed).

Policy mirrors the reference trainer (train.py:300-378): validate every
`nsave_steps`, persist only when validation rollout loss improves, keep
the step and best loss in the checkpoint for exact resume
(checkpoint_utils.py:13-42 equivalent).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _meta_path(self) -> Path:
        return self.dir / "checkpoint_meta.json"

    def save_best(self, state: Any, step: int, eval_loss: float) -> Path:
        """Save `state` as the new best checkpoint at `step`."""
        path = self.dir / f"model-best-{step:06d}"
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        with open(self._meta_path(), "w") as f:
            json.dump(
                {"step": step, "lowest_eval_loss": float(eval_loss), "path": path.name},
                f,
            )
        return path

    def save_final(self, state: Any, step: int) -> Path:
        """Fallback save when no validation ever ran (train.py:409-417)."""
        path = self.dir / f"model-final-{step:06d}"
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        with open(self._meta_path(), "w") as f:
            json.dump({"step": step, "lowest_eval_loss": None, "path": path.name}, f)
        return path

    def latest(self) -> Optional[dict]:
        if not self._meta_path().exists():
            return None
        with open(self._meta_path()) as f:
            return json.load(f)

    def restore(self, abstract_state: Any, name: Optional[str] = None) -> tuple[Any, dict]:
        """Restore by checkpoint name (or the recorded latest).

        abstract_state: pytree of jax.ShapeDtypeStruct (or concrete arrays)
        defining the target topology.
        """
        meta = self.latest()
        if name is None:
            if meta is None:
                raise FileNotFoundError(f"No checkpoint metadata in {self.dir}")
            name = meta["path"]
        # Pass the concrete template through: orbax takes shardings from the
        # target arrays, which makes restore robust across processes/topologies
        # (ShapeDtypeStructs without shardings fail in fresh processes).
        state = self._ckptr.restore(self.dir / name, abstract_state)
        return state, (meta or {"step": 0, "lowest_eval_loss": None})
