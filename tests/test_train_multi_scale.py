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

    # val/loss is now the reference's final-step per-step RMSE
    # (multi_scale_evaluate.py:102-106) — too noisy for a trend over this
    # short run; the one-step RMSE tracks model quality stably instead.
    lines = [json.loads(l) for l in open(root / "models" / "ms" / "metrics.jsonl")]
    vl = [l["val/rmse-oneStep"] for l in lines if "val/rmse-oneStep" in l]
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


def test_ms_train_data_parallel_smoke(ms_env):
    """Multi-scale DP over the 8-device CPU mesh via the config key —
    StaticGraph pytree leaves shard on the batch axis (VERDICT r1 #4)."""
    root, data = ms_env
    result = train(ms_config(
        root, data, ntraining_steps=6, nsave_steps=100,
        batch_size=8, data_parallel=4, run_name="msdp",
    ))
    assert result["step"] == 6


def test_ms_dp_step_matches_single_device(ms_env):
    """One DP step == one single-device step on the same batch + key."""
    import jax
    import jax.numpy as jnp
    import optax

    from sgnn_tpu.data.loader import load_metadata
    from sgnn_tpu.data.static_graph_loader import MultiScaleSampleBatcher
    from sgnn_tpu.parallel import make_mesh, make_dp_train_step
    from sgnn_tpu.physics.multi_scale_simulator import multi_scale_simulator_init
    from sgnn_tpu.physics.simulator import make_norm_stats
    from sgnn_tpu.train.train_multi_scale import make_train_step, ms_config_from

    root, data = ms_env
    cfg = ms_config(root, data, batch_size=4)
    metadata = load_metadata(data)
    sim_cfg = ms_config_from(cfg, metadata)
    stats = make_norm_stats(metadata, cfg.noise_std)
    params = multi_scale_simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    batcher = MultiScaleSampleBatcher(
        data / "train.npz", cfg.input_sequence_length, cfg.batch_size,
        ms_cfg=sim_cfg.graph_config, pad_multiple=cfg.pad_multiple,
        edge_pad_multiple=cfg.edge_pad_multiple, seed=0,
    )
    batch = next(iter(batcher))
    key = jax.random.key(42)
    step = make_train_step(sim_cfg, stats, cfg, tx)
    _, m_single = step(state, jax.tree.map(jnp.asarray, batch), key)
    mesh = make_mesh(data=4, graph=1)
    dp_step = make_dp_train_step(step, mesh)
    _, m_dp = dp_step(state, batch, key)
    np.testing.assert_allclose(
        float(m_dp["train/loss"]), float(m_single["train/loss"]),
        rtol=1e-5,
    )
