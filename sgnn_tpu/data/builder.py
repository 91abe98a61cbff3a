"""Dataset build pipeline: raw simulation npz -> train/valid/test + metadata.

Re-derivation of the reference builder's semantics
(datasets/taylor_impact_2d/build_dataset.py:23-421):
  * split raw files into train/val/test by filename substring patterns
    (:168-187),
  * crop each run from one step before the first frame whose mean stress
    exceeds the threshold, take `total_steps` raw steps strided by
    `step_size` (:222-236),
  * drop the last `boundary_particles_to_remove` particles and zero the
    particle types (:238-240),
  * accumulate global velocity/acceleration stats by finite differencing
    the *processed* trajectories (:252-256) — stats pool over ALL splits,
    as in the reference,
  * Z-score the stresses with the global mean/std (:270-293, 339-347),
  * write train.npz / valid.npz / test.npz ({'trajectories': dict} with
    (positions, types, stresses) tuples) + metadata.json (:313-389).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np

Trajectory = Tuple[np.ndarray, np.ndarray, np.ndarray]


class DatasetBuilder:
    def __init__(
        self,
        raw_dir: str | Path,
        out_dir: str | Path,
        *,
        step_size: int = 2,
        total_steps: int = 100,
        val_patterns: Sequence[str] = (),
        test_patterns: Sequence[str] = (),
        boundary_particles_to_remove: int = 4,
        stress_threshold: float = 0.001,
        default_connectivity_radius: float = 0.6,
        raw_dt: float = 0.002,
        random_seed: int = 42,
    ):
        self.raw_dir = Path(raw_dir)
        self.out_dir = Path(out_dir)
        self.step_size = step_size
        self.total_steps = total_steps
        self.val_patterns = list(val_patterns)
        self.test_patterns = list(test_patterns)
        self.boundary_particles_to_remove = boundary_particles_to_remove
        self.stress_threshold = stress_threshold
        self.default_connectivity_radius = default_connectivity_radius
        self.raw_dt = raw_dt
        self.random_seed = random_seed
        # Pooled stats accumulators (build_dataset.py:61-64).
        self._velocities: List[np.ndarray] = []
        self._accelerations: List[np.ndarray] = []
        self._stresses: List[np.ndarray] = []
        self._max_degree = 0
        self._pos_min: np.ndarray | None = None
        self._pos_max: np.ndarray | None = None

    # -- split ---------------------------------------------------------------

    def _split_files(self, files: List[Path]):
        train, val, test = [], [], []
        for f in files:
            if any(p in f.name for p in self.val_patterns):
                val.append(f)
            elif any(p in f.name for p in self.test_patterns):
                test.append(f)
            else:
                train.append(f)
        return train, val, test

    # -- per-trajectory processing -------------------------------------------

    def _process_file(self, path: Path) -> Trajectory | None:
        with np.load(path) as data:
            positions = data["positions"]  # [T, N, dim]
            particle_types = data["particle_types"]  # [N]
            stresses = data["strains"]  # [T, N]

        mean_stress = stresses.mean(axis=1)
        above = np.nonzero(mean_stress > self.stress_threshold)[0]
        if len(above) == 0:
            return None
        start = max(int(above[0]) - 1, 0)
        sl = slice(start, start + self.total_steps, self.step_size)
        nb = self.boundary_particles_to_remove
        keep = slice(None, -nb) if nb else slice(None)
        positions = positions[sl, keep, :]
        stresses = stresses[sl, keep]
        particle_types = np.zeros_like(particle_types[keep])

        vel = positions[1:] - positions[:-1]
        acc = vel[1:] - vel[:-1]
        dim = positions.shape[-1]
        self._velocities.append(vel.reshape(-1, dim))
        self._accelerations.append(acc.reshape(-1, dim))
        self._stresses.append(stresses.reshape(-1))

        # Radius-graph degree + spatial extent over every processed frame:
        # lets trainers size neighbor slots exactly, enable the symmetric
        # sender-gather VJP, and derive the cell-list search domain
        # (TPU-native additions; no reference counterpart).
        from scipy.spatial import cKDTree

        r = self.default_connectivity_radius
        for frame in positions:
            tree = cKDTree(frame)
            counts = tree.query_ball_point(frame, r, return_length=True)
            # counts use <= r (upper bound on the strict-< degree) — safe
            # for slot sizing, never undercounts.
            self._max_degree = max(self._max_degree, int(counts.max()))
        lo, hi = positions.min(axis=(0, 1)), positions.max(axis=(0, 1))
        if self._pos_min is None:
            self._pos_min, self._pos_max = lo, hi
        else:
            self._pos_min = np.minimum(self._pos_min, lo)
            self._pos_max = np.maximum(self._pos_max, hi)
        return (
            positions.astype(np.float32),
            particle_types.astype(np.int64),
            stresses.astype(np.float32),
        )

    def _process_split(self, files: List[Path]):
        data: Dict[str, Trajectory] = {}
        for f in sorted(files):
            traj = self._process_file(f)
            if traj is not None:
                data[f.stem] = traj
        return data

    # -- build ---------------------------------------------------------------

    def build(self) -> dict:
        files = sorted(self.raw_dir.glob("*.npz"))
        if not files:
            raise ValueError(f"No raw npz files in {self.raw_dir}")
        train_f, val_f, test_f = self._split_files(files)
        train = self._process_split(train_f)
        val = self._process_split(val_f)
        test = self._process_split(test_f)

        velocities = np.concatenate(self._velocities)
        accelerations = np.concatenate(self._accelerations)
        stresses = np.concatenate(self._stresses)
        stress_mean = float(stresses.mean())
        stress_std = float(stresses.std())

        def normalize(split):
            return {
                k: (p, t, (s - stress_mean) / stress_std)
                for k, (p, t, s) in split.items()
            }

        train, val, test = normalize(train), normalize(val), normalize(test)

        self.out_dir.mkdir(parents=True, exist_ok=True)
        np.savez(self.out_dir / "train.npz", trajectories=train)
        np.savez(self.out_dir / "valid.npz", trajectories=val)
        np.savez(self.out_dir / "test.npz", trajectories=test)

        dim = velocities.shape[-1]
        metadata = {
            "dataset_name": "Taylor-Impact-2D",
            "dim": dim,
            "sequence_length": self.total_steps // self.step_size,
            "dt": self.raw_dt * self.step_size,
            "default_connectivity_radius": self.default_connectivity_radius,
            "num_particle_types": 1,
            "vel_mean": velocities.mean(axis=0).tolist(),
            "vel_std": velocities.std(axis=0).tolist(),
            "acc_mean": accelerations.mean(axis=0).tolist(),
            "acc_std": accelerations.std(axis=0).tolist(),
            "stress_mean": stress_mean,
            "stress_std": stress_std,
            "file_train": [f.name for f in train_f],
            "file_valid": [f.name for f in val_f],
            "file_test": [f.name for f in test_f],
            "step_size": self.step_size,
            "total_steps": self.total_steps,
            "random_seed": self.random_seed,
            # TPU-native additions (no reference counterpart): observed
            # radius-graph max degree (counted with <= r — a safe upper
            # bound on the strict-< degree) and spatial extent, letting
            # trainers auto-size neighbor slots, enable the symmetric
            # sender-gather VJP, and derive the cell-list search domain.
            "max_degree": self._max_degree,
            "pos_min": self._pos_min.tolist(),
            "pos_max": self._pos_max.tolist(),
        }
        with open(self.out_dir / "metadata.json", "w") as f:
            json.dump(metadata, f, indent=2)
        return metadata


def build_dataset(raw_dir, out_dir, **kwargs) -> dict:
    return DatasetBuilder(raw_dir, out_dir, **kwargs).build()


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Build processed dataset from raw npz sims")
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--step-size", type=int, default=2)
    p.add_argument("--total-steps", type=int, default=100)
    p.add_argument("--val", nargs="*", default=[])
    p.add_argument("--test", nargs="*", default=[])
    p.add_argument("--boundary-remove", type=int, default=4)
    args = p.parse_args()
    md = build_dataset(
        args.raw,
        args.out,
        step_size=args.step_size,
        total_steps=args.total_steps,
        val_patterns=args.val,
        test_patterns=args.test,
        boundary_particles_to_remove=args.boundary_remove,
    )
    print(json.dumps({k: v for k, v in md.items() if not k.startswith("file_")}, indent=2))
