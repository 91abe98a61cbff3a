"""Multi-scale trainer end-to-end: loss decreases, rollout roundtrip."""

import json

import numpy as np
import pytest

from sgnn_tpu.data import DatasetBuilder, generate_synthetic_raw_dataset
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train_multi_scale import predict, train


@pytest.fixture(scope="module")
def ms_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrun")
    raw = root / "raw"
    data = root / "data"
    generate_synthetic_raw_dataset(raw, num_sims=3, nx=12, ny=6, num_steps=60, seed=0)
    DatasetBuilder(
        raw, data, step_size=2, total_steps=40,
        val_patterns=["-110"], test_patterns=["-120"],
        boundary_particles_to_remove=2,
    ).build()
    return root, data


def ms_config(root, data, **kw):
    base = dict(
        mode="train",
        data_path=str(data),
        model_path=str(root / "models"),
        output_path=str(root / "rollouts"),
        num_scales=2,
        window_size=2,
        radius_multiplier=2.0,
        layers=2,
        hidden_dim=16,
        dim=2,
        input_sequence_length=6,
        connection_radius=0.6,
        batch_size=4,
        noise_std=0.001,
        ntraining_steps=80,
        nsave_steps=40,
        lr_init=1e-3,
        run_name="ms",
        pad_multiple=32,
        edge_pad_multiple=512,
        seed=0,
        log_every=20,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_ms_train_and_rollout(ms_env):
    root, data = ms_env
    result = train(ms_config(root, data))
    assert result["step"] == 80
    meta = json.load(open(root / "models" / "ms" / "checkpoint_meta.json"))
    assert meta["lowest_eval_loss"] is not None

    # loss is noisy over this short run; check the validation trend instead
    lines = [json.loads(l) for l in open(root / "models" / "ms" / "metrics.jsonl")]
    vl = [l["val/loss"] for l in lines if "val/loss" in l]
    assert len(vl) >= 2 and vl[-1] < vl[0]
    tl = [l["train/loss"] for l in lines if "train/loss" in l]
    assert all(np.isfinite(tl))

    summary = predict(
        ms_config(root, data, mode="rollout", model_file=meta["path"])
    )
    assert np.isfinite(summary["total"])
    pkls = list((root / "rollouts" / "ms").glob("*.pkl"))
    assert len(pkls) == 1
    import pickle

    out = pickle.load(open(pkls[0], "rb"))
    assert "rmse_position_per_step" in out


def test_ms_train_inner_steps_smoke(ms_env):
    """Scanned inner loop for the multi-scale trainer (graphs stacked too)."""
    root, data = ms_env
    result = train(ms_config(
        root, data, ntraining_steps=8, nsave_steps=8, log_every=4,
        inner_steps=2, run_name="msinner",
    ))
    assert result["step"] == 8
