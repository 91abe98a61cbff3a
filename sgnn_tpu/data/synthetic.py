"""Synthetic Taylor-impact-like raw simulations.

The reference dataset is built from 33 proprietary LS-DYNA SPH runs (2D
copper bar impacting a rigid wall at x = -2) that are not shipped with
the repo. This module generates raw npz files with the same schema
(positions [T, N, 2], particle_types [N], strains [T, N] — von Mises
stress, field name kept for compatibility with
datasets/taylor_impact_2d/build_dataset.py:216-219) from a cheap
analytic bar-impact model, so the full pipeline (builder -> loader ->
training -> rollout) runs end-to-end and benchmarks use realistic
particle counts/graph densities.

The dynamics are not LS-DYNA physics — they are a smooth, learnable
surrogate: rigid advection toward the wall, exponential deceleration
after contact, mushrooming (lateral spread) near the impact face, and a
stress field decaying away from the wall.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _bar_lattice(nx: int, ny: int, spacing: float, x0: float, y0: float):
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing, indexing="ij")
    return np.stack([xs.ravel() + x0, ys.ravel() + y0], axis=-1)  # [N, 2]


def simulate_taylor_impact(
    *,
    nx: int = 120,
    ny: int = 40,
    spacing: float = 0.5,
    wall_x: float = -2.0,
    impact_speed: float = 0.25,
    num_steps: int = 152,
    dt: float = 1.0,
    softness: float = 3.0,
    rng: Optional[np.random.Generator] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One synthetic run. Returns (positions [T,N,2], types [N], stress [T,N]).

    Matches the raw-data scale of the reference (4801 particles, 152 steps;
    datasets/taylor_impact_2d/README.md).
    """
    rng = rng or np.random.default_rng(0)
    base = _bar_lattice(nx, ny, spacing, x0=wall_x + 1.0, y0=-(ny - 1) * spacing / 2)
    n = base.shape[0]
    # Small lattice jitter so runs differ.
    base = base + rng.normal(scale=0.02 * spacing, size=base.shape)

    bar_len = nx * spacing
    positions = np.empty((num_steps, n, 2), np.float32)
    stress = np.zeros((num_steps, n), np.float32)

    # Lagrangian coordinate along the bar (0 at impact face).
    s_coord = base[:, 0] - base[:, 0].min()
    y_coord = base[:, 1]
    gap0 = base[:, 0].min() - wall_x  # initial standoff of the face

    t_contact = gap0 / impact_speed
    for t in range(num_steps):
        time = t * dt
        if time < t_contact:
            x = base[:, 0] - impact_speed * time
            y = y_coord.copy()
            sig = np.zeros(n)
        else:
            tau = (time - t_contact) / softness
            # Compression: material near the face piles up; axial coordinate
            # compresses with a decaying profile.
            squash = 1.0 - 0.35 * np.exp(-s_coord / (0.3 * bar_len)) * (1 - np.exp(-tau))
            x = wall_x + gap0 * np.exp(-tau * 3.0) + s_coord * squash
            # Mushrooming: lateral spread near the face.
            spread = 1.0 + 0.5 * np.exp(-s_coord / (0.15 * bar_len)) * (1 - np.exp(-tau))
            y = y_coord * spread
            # Stress: peaks at the face at contact, relaxes over time.
            sig = (
                120.0
                * np.exp(-s_coord / (0.4 * bar_len))
                * (1 - np.exp(-tau * 4))
                * np.exp(-tau / 4)
            )
        positions[t, :, 0] = x
        positions[t, :, 1] = y
        stress[t] = sig + rng.normal(scale=0.5, size=n) * (sig > 0)

    particle_types = np.zeros(n, np.int64)
    return positions, particle_types, stress.astype(np.float32)


def generate_synthetic_raw_dataset(
    out_dir: str | Path,
    *,
    num_sims: int = 8,
    nx: int = 120,
    ny: int = 40,
    num_steps: int = 152,
    seed: int = 0,
) -> list[Path]:
    """Write `num_sims` raw npz files named like the reference's cases.

    Filenames follow the '<ny*2>-<speed>' convention the reference splits
    on (dataset_config.yaml val_set/test_set patterns like '60-120').
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    files = []
    for i in range(num_sims):
        speed = 0.15 + 0.02 * i
        pos, types, sig = simulate_taylor_impact(
            nx=nx,
            ny=ny,
            impact_speed=speed,
            num_steps=num_steps,
            rng=np.random.default_rng(seed + i),
        )
        name = f"sim-{ny}-{100 + 10 * i}.npz"
        path = out_dir / name
        np.savez(path, positions=pos, particle_types=types, strains=sig)
        files.append(path)
    return files


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Generate synthetic raw Taylor-impact npz files")
    p.add_argument("--out", default="datasets/taylor_impact_2d/raw_synthetic")
    p.add_argument("--num-sims", type=int, default=8)
    p.add_argument("--nx", type=int, default=120)
    p.add_argument("--ny", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    files = generate_synthetic_raw_dataset(
        args.out, num_sims=args.num_sims, nx=args.nx, ny=args.ny, seed=args.seed
    )
    print(f"wrote {len(files)} raw simulations to {args.out}")
