"""Simulator feature engineering, noise, integration, rollout tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgnn_tpu.physics import (
    NormStats,
    SimulatorConfig,
    cumulative_rmse,
    decoder_postprocess,
    encoder_preprocess,
    inverse_decoder_postprocess,
    make_norm_stats,
    predict_accelerations,
    predict_positions,
    random_walk_position_noise,
    rollout,
    simulator_init,
    time_diff,
)


def identity_stats(dim=2):
    z, o = jnp.zeros(dim), jnp.ones(dim)
    return NormStats(vel_mean=z, vel_std=o, acc_mean=z, acc_std=o)


def lattice_sequence(rng, n_side=6, s=5, dim=2):
    """Small lattice with small random drift over time."""
    grid = np.stack(
        np.meshgrid(*[np.arange(n_side) * 0.5] * dim, indexing="ij"), -1
    ).reshape(-1, dim)
    n = grid.shape[0]
    drift = rng.normal(scale=0.01, size=(n, s, dim)).cumsum(axis=1)
    return (grid[:, None, :] + drift).astype(np.float32)


def small_cfg(**kw):
    defaults = dict(
        dim=2,
        latent_dim=16,
        num_message_passing_steps=2,
        connectivity_radius=0.6,
        input_sequence_length=5,
        max_neighbors=8,
    )
    defaults.update(kw)
    return SimulatorConfig(**defaults)


def test_make_norm_stats_folds_noise():
    md = {"vel_mean": [0.1, 0.2], "vel_std": [1.0, 2.0],
          "acc_mean": [0.0, 0.0], "acc_std": [3.0, 4.0]}
    st = make_norm_stats(md, noise_std=2.0)
    np.testing.assert_allclose(np.asarray(st.vel_std), np.sqrt([1 + 4, 4 + 4]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.acc_std), np.sqrt([9 + 4, 16 + 4]), rtol=1e-6)


def test_node_and_edge_features(rng):
    cfg = small_cfg()
    pos = lattice_sequence(rng, s=cfg.input_sequence_length)
    n = pos.shape[0]
    params = simulator_init(jax.random.key(0), cfg)
    stats = identity_stats()
    nf, ef, nl = encoder_preprocess(
        params, cfg, stats, jnp.asarray(pos), jnp.zeros(n, jnp.int32)
    )
    assert nf.shape == (n, cfg.node_in)  # (S-1)*dim + 1 = 9
    assert cfg.node_in == 9
    # velocity features match finite differences
    vel = pos[:, 1:] - pos[:, :-1]
    np.testing.assert_allclose(np.asarray(nf[:, :8]), vel.reshape(n, -1), rtol=1e-5)
    # wall distance: clamp(x + 2, 0, R), unnormalized for single-scale
    expected_wall = np.clip(pos[:, -1, 0] + 2.0, 0, cfg.connectivity_radius)
    np.testing.assert_allclose(np.asarray(nf[:, 8]), expected_wall, rtol=1e-5)
    # edge displacement: (sender - receiver)/R with norm in last channel
    ef_np, senders, mask = np.asarray(ef), np.asarray(nl.senders), np.asarray(nl.mask)
    i, k = 0, 0
    assert mask[i, k]
    d = (pos[senders[i, k], -1] - pos[i, -1]) / cfg.connectivity_radius
    np.testing.assert_allclose(ef_np[i, k, :2], d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ef_np[i, k, 2], np.linalg.norm(d), rtol=1e-5)


def test_wall_distance_normalized_variant(rng):
    cfg = small_cfg(normalize_wall_distance=True)
    pos = lattice_sequence(rng, s=cfg.input_sequence_length)
    params = simulator_init(jax.random.key(0), cfg)
    nf, _, _ = encoder_preprocess(
        params, cfg, identity_stats(), jnp.asarray(pos),
        jnp.zeros(pos.shape[0], jnp.int32),
    )
    assert float(jnp.max(nf[:, 8])) <= 1.0 + 1e-6


def test_particle_type_embedding_feature(rng):
    cfg = small_cfg(num_particle_types=3)
    assert cfg.node_in == 9 + 9
    pos = lattice_sequence(rng, s=cfg.input_sequence_length)
    n = pos.shape[0]
    params = simulator_init(jax.random.key(0), cfg)
    types = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    nf, _, _ = encoder_preprocess(
        params, cfg, identity_stats(), jnp.asarray(pos), types
    )
    emb = np.asarray(params["type_embedding"]["table"])
    np.testing.assert_allclose(np.asarray(nf[:, 9:]), emb[np.asarray(types)], rtol=1e-6)


def test_euler_inverse_roundtrip(rng):
    stats = NormStats(
        vel_mean=jnp.asarray([0.1, -0.2]),
        vel_std=jnp.asarray([1.5, 0.7]),
        acc_mean=jnp.asarray([0.01, 0.02]),
        acc_std=jnp.asarray([2.0, 0.5]),
    )
    seq = jnp.asarray(rng.normal(size=(10, 5, 2)), jnp.float32)
    acc = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
    next_pos = decoder_postprocess(stats, acc, seq)
    recovered = inverse_decoder_postprocess(stats, next_pos, seq)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(acc), rtol=1e-4, atol=1e-5)


def test_noise_matches_reference_semantics(rng):
    """Numpy oracle of noise_utils.py:4-39 with the same gaussian draws."""
    key = jax.random.key(42)
    shape = (50, 6, 2)
    noise = np.asarray(random_walk_position_noise(key, shape, 0.02))
    # first frame noiseless
    assert (noise[:, 0] == 0).all()
    # variance growth: velocity noise at last step should have std ~ 0.02
    vel_noise = noise[:, 1:] - noise[:, :-1]
    last_std = vel_noise[:, -1].std()
    assert 0.01 < last_std < 0.03
    # position noise variance grows with t (random walk integrated)
    stds = noise.std(axis=(0, 2))
    assert (np.diff(stds) > 0).all()


def test_predict_accelerations_noise_cancellation(rng):
    """Target acceleration must cancel velocity noise exactly:
    target = inverse_euler(next+noise[-1], seq+noise) and the noise in the
    last velocity cancels (learned_simulator.py:482-489)."""
    cfg = small_cfg()
    stats = identity_stats()
    pos = lattice_sequence(rng, s=cfg.input_sequence_length)
    n = pos.shape[0]
    params = simulator_init(jax.random.key(0), cfg)
    next_pos = jnp.asarray(pos[:, -1] + rng.normal(scale=0.01, size=(n, 2)).astype(np.float32))
    noise = random_walk_position_noise(jax.random.key(1), pos.shape, 0.02)
    _, target, _ = predict_accelerations(
        params, cfg, stats, next_pos, noise, jnp.asarray(pos),
        jnp.zeros(n, jnp.int32),
    )
    # manual: with identity stats, target = next_vel - prev_vel where
    # next_vel uses the *noisy* last position & adjusted next position
    noisy = pos + np.asarray(noise)
    prev_vel = noisy[:, -1] - noisy[:, -2]
    next_vel = (np.asarray(next_pos) + np.asarray(noise)[:, -1]) - noisy[:, -1]
    expected = next_vel - prev_vel
    np.testing.assert_allclose(np.asarray(target), expected, rtol=1e-4, atol=1e-5)


def test_cumulative_rmse_matches_numpy(rng):
    pred = rng.normal(size=(7, 20, 2)).astype(np.float32)
    gt = rng.normal(size=(7, 20, 2)).astype(np.float32)
    sq = np.square(pred - gt).reshape(7, -1)
    expected = np.sqrt(np.cumsum(sq.mean(1)) / np.arange(1, 8))
    got = np.asarray(cumulative_rmse(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("mode", ["autoregressive", "one_step"])
def test_rollout_shapes_and_modes(rng, mode):
    cfg = small_cfg()
    s = cfg.input_sequence_length
    t = s + 4
    pos_seq = lattice_sequence(rng, s=t)  # [N, T, dim]
    n = pos_seq.shape[0]
    params = simulator_init(jax.random.key(0), cfg)
    strains = rng.normal(size=(t, n)).astype(np.float32)
    out = rollout(
        params, cfg, identity_stats(), jnp.asarray(pos_seq),
        jnp.zeros(n, jnp.int32), jnp.asarray(strains), inference_mode=mode,
    )
    assert out["predicted_rollout"].shape == (4, n, 2)
    assert out["predicted_strain"].shape == (4, n)
    assert out["rmse_position"].shape == (4,)
    assert np.isfinite(np.asarray(out["predicted_rollout"])).all()


def test_rollout_erosional_particles_follow_ground_truth(rng):
    cfg = small_cfg()
    s = cfg.input_sequence_length
    t = s + 3
    pos_seq = lattice_sequence(rng, s=t)
    n = pos_seq.shape[0]
    types = np.zeros(n, np.int32)
    types[:5] = -1  # erosional
    params = simulator_init(jax.random.key(0), cfg)
    strains = rng.normal(size=(t, n)).astype(np.float32)
    out = rollout(
        params, cfg, identity_stats(), jnp.asarray(pos_seq),
        jnp.asarray(types), jnp.asarray(strains),
    )
    pred = np.asarray(out["predicted_rollout"])
    gt = np.asarray(out["ground_truth_rollout"])
    np.testing.assert_allclose(pred[:, :5], gt[:, :5], rtol=1e-6)
    pred_strain = np.asarray(out["predicted_strain"])
    np.testing.assert_allclose(pred_strain[:, :5], strains[s:, :5], rtol=1e-6)
    # non-erosional particles differ from ground truth (untrained model)
    assert np.abs(pred[:, 5:] - gt[:, 5:]).max() > 1e-6


def test_one_step_mode_uses_ground_truth_window(rng):
    """In one_step mode, step t's prediction is independent of earlier
    predictions: manually compare with direct predict_positions."""
    cfg = small_cfg()
    s = cfg.input_sequence_length
    t = s + 3
    pos_seq = lattice_sequence(rng, s=t)
    n = pos_seq.shape[0]
    params = simulator_init(jax.random.key(0), cfg)
    strains = np.zeros((t, n), np.float32)
    out = rollout(
        params, cfg, identity_stats(), jnp.asarray(pos_seq),
        jnp.zeros(n, jnp.int32), jnp.asarray(strains), inference_mode="one_step",
    )
    # step 2 window = ground truth frames [2 : 2+s]
    window = jnp.asarray(pos_seq[:, 2 : 2 + s])
    direct, _ = predict_positions(
        params, cfg, identity_stats(), window, jnp.zeros(n, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out["predicted_rollout"][2]), np.asarray(direct), rtol=1e-5, atol=1e-6
    )
