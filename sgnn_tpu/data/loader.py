"""Fixed-shape data loading for XLA.

Replaces the reference's torch DataLoaders
(datasets/taylor_impact_2d/taylor_impact_data_loader.py:96-347) with a
TPU-first batching scheme: instead of concatenating variable particle
counts along one axis (reference collate_fn :243-284), every graph is
padded to a common node count and batched on a leading axis
[B, N_pad, ...] with a boolean node mask. This gives XLA one static
shape for the whole run (no recompiles), vmaps cleanly over the batch,
and shards along the batch axis for data parallelism.

Sample semantics mirror TaylorImpactSamplesDataset.__getitem__
(:143-181): a sample at (traj, t) is the window positions[t-S:t] as
inputs and positions[t] / stresses[t] as targets.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np

Trajectory = Tuple[np.ndarray, np.ndarray, np.ndarray]


def load_metadata(data_dir: str | Path) -> dict:
    with open(Path(data_dir) / "metadata.json") as f:
        return json.load(f)


def load_trajectories(path: str | Path) -> List[Trajectory]:
    """npz -> list of (positions [T,N,dim], types [N], stresses [T,N])."""
    with np.load(path, allow_pickle=True) as data:
        trajectories = data["trajectories"].item()
    out = []
    for name in sorted(trajectories):
        t = trajectories[name]
        if isinstance(t, tuple) and len(t) == 3:
            out.append(t)
    return out


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def dataset_info(path: str | Path) -> dict:
    """Summary of an npz split without loading everything into batches
    (reference get_dataset_info, taylor_impact_data_loader.py:350-383)."""
    trajs = load_trajectories(path)
    if not trajs:
        return {"num_trajectories": 0}
    pos, types, stress = trajs[0]
    return {
        "num_trajectories": len(trajs),
        "dimension": int(pos.shape[-1]),
        "max_timesteps": int(max(p.shape[0] for p, _, _ in trajs)),
        "num_particles": int(max(p.shape[1] for p, _, _ in trajs)),
        "particle_types": sorted(
            {int(t) for _, ty, _ in trajs for t in np.unique(ty)}
        ),
        "stress_range": [
            float(min(s.min() for _, _, s in trajs)),
            float(max(s.max() for _, _, s in trajs)),
        ],
    }


class SampleBatcher:
    """Shuffled fixed-shape training batches.

    Yields dicts of numpy arrays:
      positions  f32[B, Np, S, dim]
      particle_type i32[B, Np]
      node_mask  bool[B, Np]
      next_position f32[B, Np, dim]
      next_strain   f32[B, Np]
    Padded node slots carry zeros and mask False.
    """

    def __init__(
        self,
        path: str | Path,
        input_sequence_length: int,
        batch_size: int,
        *,
        pad_multiple: int = 128,
        seed: int = 0,
        drop_remainder: bool = True,
    ):
        self.trajectories = load_trajectories(path)
        if not self.trajectories:
            raise ValueError(f"No trajectories in {path}")
        self.s = input_sequence_length
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

        self.dim = self.trajectories[0][0].shape[-1]
        max_n = max(p.shape[1] for p, _, _ in self.trajectories)
        self.num_nodes = _round_up(max_n, pad_multiple)

        # Flattened (traj_idx, time_idx) sample index, as in the reference's
        # cumulative-length scheme (taylor_impact_data_loader.py:129-155).
        self.samples: List[Tuple[int, int]] = []
        for ti, (pos, _, _) in enumerate(self.trajectories):
            for t in range(self.s, pos.shape[0]):
                self.samples.append((ti, t))

    def __len__(self) -> int:
        return len(self.samples)

    def steps_per_epoch(self) -> int:
        n = len(self.samples) // self.batch_size
        if not self.drop_remainder and len(self.samples) % self.batch_size:
            n += 1
        return n

    def _gather(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        b = len(idxs)
        np_, s, dim = self.num_nodes, self.s, self.dim
        batch = {
            "positions": np.zeros((b, np_, s, dim), np.float32),
            "particle_type": np.zeros((b, np_), np.int32),
            "node_mask": np.zeros((b, np_), bool),
            "next_position": np.zeros((b, np_, dim), np.float32),
            "next_strain": np.zeros((b, np_), np.float32),
            # which trajectory each sample came from (consumers with
            # per-trajectory static state — ms partition plans — key on it)
            "traj_idx": np.zeros((b,), np.int32),
        }
        for k, sample_i in enumerate(idxs):
            ti, t = self.samples[sample_i]
            batch["traj_idx"][k] = ti
            pos, types, stress = self.trajectories[ti]
            n = pos.shape[1]
            # [S, n, dim] -> [n, S, dim] (reference transpose, loader :159-160)
            batch["positions"][k, :n] = np.transpose(pos[t - s : t], (1, 0, 2))
            batch["particle_type"][k, :n] = types
            batch["node_mask"][k, :n] = True
            batch["next_position"][k, :n] = pos[t]
            batch["next_strain"][k, :n] = stress[t]
        return batch

    def epochs(self) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite shuffled stream (reshuffles every epoch)."""
        while True:
            order = self._rng.permutation(len(self.samples))
            bs = self.batch_size
            end = len(order) - (len(order) % bs if self.drop_remainder else 0)
            for i in range(0, end, bs):
                yield self._gather(order[i : i + bs])

    def __iter__(self):
        """One shuffled epoch."""
        order = self._rng.permutation(len(self.samples))
        bs = self.batch_size
        end = len(order) - (len(order) % bs if self.drop_remainder else 0)
        for i in range(0, end, bs):
            yield self._gather(order[i : i + bs])


class TrajectoryLoader:
    """Whole trajectories for rollout evaluation, padded to a common N.

    Yields dicts:
      positions f32[Np, T, dim]   (reference layout, loader :229-239)
      particle_type i32[Np]
      node_mask bool[Np]
      strains  f32[T, Np]
    """

    def __init__(self, path: str | Path, *, pad_multiple: int = 128):
        self.trajectories = load_trajectories(path)
        max_n = max(p.shape[1] for p, _, _ in self.trajectories) if self.trajectories else 0
        self.num_nodes = _round_up(max_n, pad_multiple)

    def __len__(self):
        return len(self.trajectories)

    def __iter__(self):
        for pos, types, stress in self.trajectories:
            t, n, dim = pos.shape
            np_ = self.num_nodes
            out = {
                "positions": np.zeros((np_, t, dim), np.float32),
                "particle_type": np.zeros((np_,), np.int32),
                "node_mask": np.zeros((np_,), bool),
                "strains": np.zeros((t, np_), np.float32),
            }
            out["positions"][:n] = np.transpose(pos, (1, 0, 2))
            out["particle_type"][:n] = types
            out["node_mask"][:n] = True
            out["strains"][:, :n] = stress
            yield out
