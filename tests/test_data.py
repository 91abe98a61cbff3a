"""Data pipeline: synthetic generator -> builder -> loaders."""

import json

import numpy as np
import pytest

from sgnn_tpu.data import (
    DatasetBuilder,
    SampleBatcher,
    TrajectoryLoader,
    generate_synthetic_raw_dataset,
    load_metadata,
    load_trajectories,
)


@pytest.fixture(scope="module")
def built_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    raw = root / "raw"
    out = root / "processed"
    generate_synthetic_raw_dataset(raw, num_sims=4, nx=16, ny=6, num_steps=60, seed=0)
    md = DatasetBuilder(
        raw,
        out,
        step_size=2,
        total_steps=40,
        val_patterns=["-110"],
        test_patterns=["-120"],
        boundary_particles_to_remove=4,
    ).build()
    return out, md


def test_builder_metadata(built_dataset):
    out, md = built_dataset
    assert md["dim"] == 2
    assert md["sequence_length"] == 20
    assert len(md["vel_mean"]) == 2
    assert md["stress_std"] > 0
    # splits: 4 sims, 1 val (-110), 1 test (-120), 2 train
    assert len(md["file_train"]) == 2
    assert len(md["file_valid"]) == 1
    assert len(md["file_test"]) == 1
    assert (out / "metadata.json").exists()
    assert json.load(open(out / "metadata.json"))["dim"] == 2
    # TPU-native additions: recorded degree bound + spatial extent
    assert md["max_degree"] >= 5  # lattice: self + 4 axial within r=0.6
    assert len(md["pos_min"]) == 2 and len(md["pos_max"]) == 2
    assert all(a < b for a, b in zip(md["pos_min"], md["pos_max"]))


def test_builder_crop_and_boundary_removal(built_dataset):
    out, md = built_dataset
    trajs = load_trajectories(out / "train.npz")
    assert len(trajs) == 2
    pos, types, stress = trajs[0]
    assert pos.shape[0] == 20  # 40 raw steps strided by 2
    assert pos.shape[1] == 16 * 6 - 4  # boundary particles removed
    assert stress.shape == (20, pos.shape[1])
    assert (types == 0).all()
    # stress z-scored globally: pooled stats roughly standard
    all_stress = np.concatenate(
        [s.ravel() for split in ["train", "valid", "test"]
         for _, _, s in load_trajectories(out / f"{split}.npz")]
    )
    assert abs(all_stress.mean()) < 0.05
    assert abs(all_stress.std() - 1.0) < 0.05


def test_sample_batcher_shapes(built_dataset):
    out, _ = built_dataset
    b = SampleBatcher(out / "train.npz", input_sequence_length=5, batch_size=3,
                      pad_multiple=32, seed=0)
    n_traj, t = 2, 20
    assert len(b) == n_traj * (t - 5)
    batch = next(iter(b))
    n_pad = b.num_nodes
    assert n_pad % 32 == 0 and n_pad >= 92
    assert batch["positions"].shape == (3, n_pad, 5, 2)
    assert batch["next_position"].shape == (3, n_pad, 2)
    assert batch["next_strain"].shape == (3, n_pad)
    assert batch["node_mask"].shape == (3, n_pad)
    assert batch["node_mask"][:, :92].all()
    assert not batch["node_mask"][:, 92:].any()
    # padded slots zero
    assert (batch["positions"][:, 92:] == 0).all()


def test_sample_batcher_window_semantics(built_dataset):
    out, _ = built_dataset
    b = SampleBatcher(out / "train.npz", input_sequence_length=5, batch_size=1,
                      pad_multiple=32, seed=0)
    ti, t = b.samples[7]
    pos, types, stress = b.trajectories[ti]
    batch = b._gather(np.asarray([7]))
    n = pos.shape[1]
    np.testing.assert_allclose(
        batch["positions"][0, :n], np.transpose(pos[t - 5 : t], (1, 0, 2))
    )
    np.testing.assert_allclose(batch["next_position"][0, :n], pos[t])
    np.testing.assert_allclose(batch["next_strain"][0, :n], stress[t])


def test_trajectory_loader(built_dataset):
    out, _ = built_dataset
    loader = TrajectoryLoader(out / "valid.npz", pad_multiple=32)
    trajs = list(loader)
    assert len(trajs) == 1
    tr = trajs[0]
    assert tr["positions"].shape[0] == loader.num_nodes
    assert tr["positions"].shape[2] == 2
    assert tr["strains"].shape[1] == loader.num_nodes
    assert tr["node_mask"].sum() == 92


def test_epoch_reshuffles(built_dataset):
    out, _ = built_dataset
    b = SampleBatcher(out / "train.npz", input_sequence_length=5, batch_size=1,
                      pad_multiple=32, seed=1)
    it = b.epochs()
    first_epoch = [float(next(it)["next_strain"].sum()) for _ in range(b.steps_per_epoch())]
    second_epoch = [float(next(it)["next_strain"].sum()) for _ in range(b.steps_per_epoch())]
    # same samples each epoch, different order
    np.testing.assert_allclose(sorted(first_epoch), sorted(second_epoch), rtol=1e-6)
    assert first_epoch != second_epoch
