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


def test_multi_step_matches_single_steps():
    """lax.scan multi-step == the same single steps run back to back."""
    import jax
    import jax.numpy as jnp
    import optax

    from sgnn_tpu.physics.simulator import (
        NormStats, SimulatorConfig, simulator_init,
    )
    from sgnn_tpu.train.train import make_train_multi_step, make_train_step

    n, s, b, t = 24, 4, 2, 3
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=8, num_message_passing_steps=2,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=20,
    )
    stats = NormStats(
        vel_mean=jnp.zeros(2), vel_std=jnp.ones(2),
        acc_mean=jnp.zeros(2), acc_std=jnp.ones(2),
    )
    cfg = TrainConfig(
        batch_size=b, noise_std=0.001, input_sequence_length=s,
        hidden_dim=8, layers=2,
    )
    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state0 = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    rng = np.random.default_rng(0)
    grid = np.stack(
        np.meshgrid(np.arange(6) * 0.5, np.arange(4) * 0.5, indexing="ij"), -1
    ).reshape(-1, 2).astype(np.float32)

    def mkbatch(i):
        return {
            "positions": jnp.asarray(
                grid[None, :, None, :]
                + rng.normal(scale=0.002, size=(b, n, s, 2)).cumsum(2).astype(np.float32)
            ),
            "next_position": jnp.asarray(
                grid[None] + rng.normal(scale=0.004, size=(b, n, 2)).astype(np.float32)
            ),
            "next_strain": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)),
            "particle_type": jnp.zeros((b, n), jnp.int32),
            "node_mask": jnp.ones((b, n), bool),
        }

    batches = [mkbatch(i) for i in range(t)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    key = jax.random.key(7)

    single = make_train_step(sim_cfg, stats, cfg, tx)
    st = state0
    single_losses = []
    for i in range(t):
        st, m = single(st, batches[i], jax.random.fold_in(key, np.uint32(i)))
        single_losses.append(float(m["train/loss"]))

    multi = make_train_multi_step(sim_cfg, stats, cfg, tx, num_steps=t)
    st2, metrics = multi(state0, stacked, key)

    assert int(st2["step"]) == t
    np.testing.assert_allclose(
        np.asarray(metrics["train/loss"]), np.asarray(single_losses), rtol=2e-5, atol=2e-6
    )
    for a, b_ in zip(jax.tree.leaves(st["params"]), jax.tree.leaves(st2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6)


def test_train_inner_steps_smoke(tiny_env):
    """Scanned inner loop (inner_steps=2), alone and composed with DP."""
    root, data = tiny_env
    cfg = tiny_config(
        root, data, ntraining_steps=8, nsave_steps=8, log_every=4,
        inner_steps=2, run_name="inner",
    )
    assert train(cfg)["step"] == 8
    cfg = tiny_config(
        root, data, ntraining_steps=8, nsave_steps=8, log_every=4,
        inner_steps=2, batch_size=8, data_parallel=4, run_name="innerdp",
    )
    assert train(cfg)["step"] == 8


def test_train_inner_steps_divisibility_error(tiny_env):
    root, data = tiny_env
    cfg = tiny_config(root, data, ntraining_steps=9, inner_steps=2)
    with pytest.raises(ValueError, match="inner_steps"):
        train(cfg)


def test_train_graph_parallel_end_to_end(tiny_env):
    """Edge-partitioned training via the config key: trains over the
    8-device CPU mesh (graph axis), validates with the distributed
    rollout, checkpoints, and the loss decreases."""
    root, data = tiny_env
    cfg = tiny_config(
        root, data, ntraining_steps=40, nsave_steps=20, log_every=1,
        batch_size=1, graph_parallel=4, run_name="gp", noise_std=0.001,
    )
    result = train(cfg)
    assert result["step"] == 40
    assert np.isfinite(result["lowest_eval_loss"])
    lines = [json.loads(l) for l in open(root / "models" / "gp" / "metrics.jsonl")]
    tl = [l["train/loss"] for l in lines if "train/loss" in l]
    # single-sample losses are noisy: compare untrained start vs trained tail
    assert np.mean(tl[-8:]) < np.mean(tl[:3]), f"loss did not decrease: {tl}"
    hv = [l["train/halo_violations"] for l in lines if "train/halo_violations" in l]
    assert hv and max(hv) == 0

    # distributed rollout via predict(): pickles in the caller layout
    meta = json.load(open(root / "models" / "gp" / "checkpoint_meta.json"))
    cfg = tiny_config(
        root, data, mode="rollout", model_file=meta["path"],
        batch_size=1, graph_parallel=4, run_name="gp",
    )
    summary = predict(cfg)
    assert np.isfinite(summary["total"])


def test_train_graph_parallel_config_errors(tiny_env):
    root, data = tiny_env
    with pytest.raises(ValueError, match="batch_size"):
        train(tiny_config(root, data, batch_size=4, graph_parallel=4))
    with pytest.raises(ValueError, match="mutually exclusive"):
        train(tiny_config(root, data, batch_size=1, graph_parallel=4,
                          data_parallel=2))
