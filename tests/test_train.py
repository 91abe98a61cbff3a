"""End-to-end training integration: loss decreases, checkpoint roundtrip."""

import json

import numpy as np
import pytest

from sgnn_tpu.data import DatasetBuilder, generate_synthetic_raw_dataset
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train import predict, train


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyrun")
    raw = root / "raw"
    data = root / "data"
    generate_synthetic_raw_dataset(raw, num_sims=3, nx=12, ny=5, num_steps=60, seed=0)
    DatasetBuilder(
        raw, data, step_size=2, total_steps=40,
        val_patterns=["-110"], test_patterns=["-120"],
        boundary_particles_to_remove=2,
    ).build()
    return root, data


def tiny_config(root, data, **kw):
    base = dict(
        mode="train",
        data_path=str(data),
        model_path=str(root / "models"),
        output_path=str(root / "rollouts"),
        layers=2,
        hidden_dim=16,
        dim=2,
        input_sequence_length=6,
        connection_radius=0.6,
        batch_size=4,
        noise_std=0.001,
        ntraining_steps=120,
        nsave_steps=60,
        lr_init=1e-3,
        run_name="t",
        pad_multiple=32,
        seed=0,
        log_every=20,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_loss_decreases_and_checkpoints(tiny_env):
    root, data = tiny_env
    cfg = tiny_config(root, data)
    result = train(cfg)
    assert result["step"] == 120
    # best checkpoint written during validation
    meta = json.load(open(root / "models" / "t" / "checkpoint_meta.json"))
    assert meta["lowest_eval_loss"] is not None
    assert (root / "models" / "t" / meta["path"]).exists()

    # loss trend from the metrics log
    lines = [json.loads(l) for l in open(root / "models" / "t" / "metrics.jsonl")]
    tl = [l["train/loss"] for l in lines if "train/loss" in l]
    assert len(tl) >= 4
    assert tl[-1] < tl[0], f"loss did not decrease: {tl[0]} -> {tl[-1]}"


def test_predict_roundtrip(tiny_env):
    root, data = tiny_env
    meta = json.load(open(root / "models" / "t" / "checkpoint_meta.json"))
    cfg = tiny_config(root, data, mode="rollout", model_file=meta["path"])
    summary = predict(cfg)
    assert np.isfinite(summary["total"])
    pkls = list((root / "rollouts" / "t").glob("*.pkl"))
    assert len(pkls) == 1  # one test trajectory
    import pickle

    out = pickle.load(open(pkls[0], "rb"))
    for k in [
        "initial_positions", "predicted_rollout", "ground_truth_rollout",
        "predicted_strain", "ground_truth_strain", "particle_types",
        "rmse_position", "rmse_strain", "run_time", "metadata", "case_name",
    ]:
        assert k in out, k
    t = out["predicted_rollout"].shape[0]
    assert out["rmse_position"].shape == (t,)


def test_resume_from_checkpoint(tiny_env):
    root, data = tiny_env
    meta = json.load(open(root / "models" / "t" / "checkpoint_meta.json"))
    cfg = tiny_config(
        root, data, ntraining_steps=130, model_file=meta["path"]
    )
    result = train(cfg)
    assert result["step"] == 130


def test_train_data_parallel_smoke(tiny_env):
    """DP training over the 8-device CPU mesh via the config key."""
    root, data = tiny_env
    cfg = tiny_config(
        root, data, ntraining_steps=6, nsave_steps=100,
        batch_size=8, data_parallel=4, run_name="dp",
    )
    result = train(cfg)
    assert result["step"] == 6
