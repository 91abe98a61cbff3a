"""Auxiliary subsystems: graph audit, profiling counters, 3D support."""

import numpy as np

import jax
import jax.numpy as jnp

from sgnn_tpu.ops import radius_neighbors_bruteforce
from sgnn_tpu.utils.graph_debug import audit_neighbor_list
from sgnn_tpu.utils.profiling import StepProfiler, trace_region


def test_graph_audit(rng):
    pos = rng.uniform(-1, 1, size=(50, 2)).astype(np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 0.5, max_neighbors=32)
    stats = audit_neighbor_list(pos, nl, 0.5, verbose=False)
    assert stats["num_nodes"] == 50
    assert stats["num_edges"] == int(np.asarray(nl.mask).sum())
    assert stats["isolated_nodes"] == 0  # self loops guarantee degree >= 1
    assert stats["spot_check_failures"] == []


def test_graph_audit_detects_isolation(rng):
    # no self loops + far-apart points -> isolated nodes
    pos = np.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]], np.float32)
    nl = radius_neighbors_bruteforce(
        jnp.asarray(pos), 0.5, max_neighbors=4, include_self=False
    )
    stats = audit_neighbor_list(pos, nl, 0.5, verbose=False, num_spot_checks=0)
    assert stats["isolated_nodes"] == 3


def test_step_profiler():
    prof = StepProfiler(edges_per_step=100)
    prof.tick(); prof.tick()
    s = prof.summary()
    assert s["steps"] == 2 and s["edge_updates_per_s"] > 0
    with trace_region("noop"):
        pass


def test_simulator_3d(rng):
    """BASELINE.json configs[4]: dim=3 support end-to-end."""
    from sgnn_tpu.physics import (
        NormStats, SimulatorConfig, predict_accelerations, rollout,
        simulator_init,
    )

    cfg = SimulatorConfig(
        dim=3, latent_dim=16, num_message_passing_steps=2,
        input_sequence_length=4, connectivity_radius=0.6, max_neighbors=16,
    )
    assert cfg.node_in == 3 * 3 + 1 and cfg.edge_in == 4 and cfg.node_out == 4
    n, t = 60, 7
    grid = rng.uniform(0, 2, size=(n, 3)).astype(np.float32)
    drift = rng.normal(scale=0.01, size=(n, t, 3)).cumsum(axis=1).astype(np.float32)
    pos = jnp.asarray(grid[:, None, :] + drift)
    stats = NormStats(jnp.zeros(3), jnp.ones(3), jnp.zeros(3), jnp.ones(3))
    params = simulator_init(jax.random.key(0), cfg)
    types = jnp.zeros(n, jnp.int32)

    pred, target, strain = predict_accelerations(
        params, cfg, stats, pos[:, -1], jnp.zeros_like(pos[:, :4]),
        pos[:, :4], types,
    )
    assert pred.shape == (n, 3) and strain.shape == (n,)

    out = rollout(
        params, cfg, stats, pos, types,
        jnp.asarray(rng.normal(size=(t, n)).astype(np.float32)),
    )
    assert out["predicted_rollout"].shape == (t - 4, n, 3)
    assert np.isfinite(np.asarray(out["predicted_rollout"])).all()


def test_forward_batched_3d_domain(rng):
    """3D flat path with the cell-table search."""
    from sgnn_tpu.physics.simulator import (
        NormStats, SimulatorConfig, forward_batched, simulator_init,
    )

    cfg = SimulatorConfig(
        dim=3, latent_dim=16, num_message_passing_steps=2,
        input_sequence_length=4, connectivity_radius=0.6, max_neighbors=16,
        domain=((-0.5, -0.5, -0.5), (2.5, 2.5, 2.5)),
    )
    b, n = 2, 40
    grid = rng.uniform(0, 2, size=(b, n, 3)).astype(np.float32)
    seq = jnp.asarray(
        grid[:, :, None, :]
        + rng.normal(scale=0.005, size=(b, n, 4, 3)).cumsum(2).astype(np.float32)
    )
    stats = NormStats(jnp.zeros(3), jnp.ones(3), jnp.zeros(3), jnp.ones(3))
    params = simulator_init(jax.random.key(0), cfg)
    acc, strain = forward_batched(
        params, cfg, stats, seq, jnp.zeros((b, n), jnp.int32), use_pallas=False
    )
    assert acc.shape == (b, n, 3)
    assert np.isfinite(np.asarray(acc)).all()


def test_device_prefetcher(rng):
    import numpy as np
    import jax.numpy as jnp
    from sgnn_tpu.data.prefetch import DevicePrefetcher

    batches = [{"x": rng.normal(size=(4, 8)).astype(np.float32), "i": i}
               for i in range(5)]
    with DevicePrefetcher(iter(batches), depth=2) as pf:
        out = list(pf)
    assert [b["i"] for b in out] == list(range(5))
    for a, b in zip(out, batches):
        assert isinstance(a["x"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])


def test_device_prefetcher_propagates_errors():
    from sgnn_tpu.data.prefetch import DevicePrefetcher
    import pytest

    def bad():
        yield {"x": 1}
        raise RuntimeError("loader exploded")

    with DevicePrefetcher(bad(), depth=2) as pf:
        next(pf)
        with pytest.raises(RuntimeError, match="loader exploded"):
            next(pf)


def test_device_prefetcher_close_unblocks_infinite_stream():
    import itertools
    from sgnn_tpu.data.prefetch import DevicePrefetcher

    pf = DevicePrefetcher(({"i": i} for i in itertools.count()), depth=1)
    assert next(pf)["i"] == 0
    pf.close()  # must not hang


def test_render_rollout_gif(tmp_path, rng):
    """Renderer writes a GIF from the trainer's rollout pickle schema,
    including batch mode (render_rollout.py:248-299, 357-396 parity)."""
    import pickle
    from sgnn_tpu.viz.render_rollout import render_rollout_dict, render_rollout_file

    t, n = 4, 30
    gt = rng.normal(size=(t, n, 2)).astype(np.float32)
    rollout = {
        "ground_truth_rollout": gt,
        "predicted_rollout": gt + 0.01,
        "ground_truth_strain": rng.normal(size=(t, n)).astype(np.float32),
        "predicted_strain": rng.normal(size=(t, n)).astype(np.float32),
        "rmse_position": np.linspace(0, 1e-2, t),
        "particle_types": np.zeros(n, np.int32),
        "metadata": {"stress_mean": 150.0, "stress_std": 80.0},
    }
    out = render_rollout_dict(rollout, tmp_path / "case.gif", fps=2)
    assert out.exists() and out.stat().st_size > 1000

    with open(tmp_path / "case.pkl", "wb") as f:
        pickle.dump(rollout, f)
    out2 = render_rollout_file(tmp_path / "case.pkl", tmp_path / "case2.gif", fps=2)
    assert out2.exists()


def test_parity_vs_checkpoint_driver(tmp_path):
    """scripts/parity_vs_checkpoint.py end-to-end against the committed
    golden oracle weights as a reference-checkpoint stand-in (VERDICT r4
    missing #1): export the golden single-scale params into the
    reference state_dict naming, feed them + the fixture inputs through
    the driver, and require every expect/ stage (torch-oracle bytes) to
    pass; a corrupted weight must fail."""
    import subprocess
    import sys
    from pathlib import Path

    import numpy as np

    from sgnn_tpu.utils.torch_import import (
        export_single_scale,
        import_single_scale,
    )
    from test_golden_parity import unflatten_params

    fix = np.load(Path(__file__).parent / "fixtures" / "golden_sim.npz")
    flat = {
        k[len("ss/param/"):]: fix[k] for k in fix.files
        if k.startswith("ss/param/")
    }
    params = {"epd": unflatten_params(flat)}
    params["type_embedding"] = {"table": fix["ss/emb_table"]}

    sd = export_single_scale(params)
    # round-trip sanity: import(export(params)) == params bytes
    rt = import_single_scale(sd)
    import jax

    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ckpt = tmp_path / "ref_ckpt.npz"
    np.savez(ckpt, **sd)

    n, s, dim, k, d, steps, nlayers, ntypes = (int(v) for v in fix["ss/meta"])
    r, wall_x = (float(v) for v in fix["ss/radius"])
    inp = {
        "position_sequence": fix["ss/seq"],
        "particle_types": fix["ss/types"],
        "vel_mean": fix["ss/vel_mean"],
        "vel_std": fix["ss/vel_std"],
        "acc_mean": fix["ss/acc_mean"],
        "acc_std": fix["ss/acc_std"],
        "expect/node_feat": fix["ss/node_feat"],
        "expect/output": np.concatenate(
            [fix["ss/golden_norm_acc"], fix["ss/golden_strain"][:, None]], axis=1
        ),
        "expect/next_positions": fix["ss/golden_next_pos"],
    }
    inp_path = tmp_path / "input.npz"
    np.savez(inp_path, **inp)

    cmd = [
        sys.executable, str(Path(__file__).parent.parent / "scripts" /
                            "parity_vs_checkpoint.py"),
        "--checkpoint", str(ckpt), "--input", str(inp_path),
        "--radius", str(r), "--max-neighbors", str(k),
        "--wall-x", str(wall_x), "--tol", "2e-4",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "3/3 provided stages within tol" in res.stdout

    # corrupting one weight must FAIL the activation stages
    sd_bad = dict(sd)
    key = "_encode_process_decode._encoder.node_fn.0.NN-0.weight"
    sd_bad[key] = sd_bad[key] + 0.1
    np.savez(ckpt, **sd_bad)
    res = subprocess.run(cmd, capture_output=True, text=True)
    assert res.returncode == 1, res.stdout + res.stderr
    assert "FAIL" in res.stdout
