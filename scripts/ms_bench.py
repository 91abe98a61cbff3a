"""Multi-scale training-step benchmark at reference scale.

B=8 graphs x 4797 particles, 2 scales, window 2, 6 M2M layers, hidden
64 (configs/taylor2d_multi_scale_demo.yaml model shape) with realistic
edge pads. Same scan harness as bench.py: ITERS dependency-chained
optimizer steps per dispatch, 3 dispatches timed.

Prints one JSON line {metric, value, unit, step_time_ms, ...} where the
metric is message-passing edge updates (real edges x blocks traversing
them) per second.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

import bench
from sgnn_tpu.physics.multi_scale_graph import build_static_graph
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    NormStats,
    multi_scale_simulator_init,
)
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train_multi_scale import make_train_step

BATCH = 8
N = 4797
S = 2
M2M_LAYERS = 6
HIDDEN = 64
ITERS = 10
ROUNDS = 3


def make_setup():
    """(sim_cfg, stats, cfg, pos, counts, graph1) for the bench config.

    Default layout: tight-slot dense (the trainer's auto pick for this
    dataset); MS_COO=1 forces the flat COO path. Shared with ms_profile.
    """
    sim_cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=HIDDEN, num_message_passing_steps=M2M_LAYERS,
        input_sequence_length=S, num_scales=2, window_size=2,
        # bf16 edge tensors in the dense path (MS_F32=1 restores f32)
        compute_dtype="float32" if os.environ.get("MS_F32") else "bfloat16",
    )
    stats = NormStats(vel_mean=jnp.zeros(2), vel_std=jnp.ones(2),
                      acc_mean=jnp.zeros(2), acc_std=jnp.ones(2))
    cfg = TrainConfig(batch_size=BATCH, noise_std=0.02,
                      input_sequence_length=S, hidden_dim=HIDDEN,
                      layers=M2M_LAYERS, num_scales=2, window_size=2)
    pos = bench.lattice(N)

    gc = sim_cfg.graph_config
    from sgnn_tpu.physics.multi_scale_graph import create_all_edges

    all_edges = create_all_edges(gc, pos)
    counts = {
        "g2m": len(all_edges["grid2mesh_edges"].senders),
        "m2m": len(all_edges["mesh2mesh_edges"].senders),
        "m2g": len(all_edges["mesh2grid_edges"].senders),
    }
    pad = lambda e: -(-e // 1024) * 1024
    if not os.environ.get("MS_COO"):
        # Dense per-receiver slots with TIGHT per-type widths: the static
        # graph never changes, so slots = exact max degree (no noise
        # margin). On this lattice: g2m/m2m deg<=9, m2g deg<=4.
        import numpy as _np

        from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph

        def deg_stats(e):
            cnt = _np.bincount(_np.asarray(e.receivers))
            nz = cnt[cnt > 0]
            return len(nz), int(nz.max())

        (g2m_r, g2m_k) = deg_stats(all_edges["grid2mesh_edges"])
        (m2m_r, m2m_k) = deg_stats(all_edges["mesh2mesh_edges"])
        (m2g_r, m2g_k) = deg_stats(all_edges["mesh2grid_edges"])
        rpad = lambda r: -(-r // 128) * 128
        graph1 = build_dense_static_graph(
            gc, pos,
            g2m_rows=rpad(g2m_r), m2m_rows=rpad(m2m_r), m2g_rows=rpad(m2g_r),
            g2m_slots=g2m_k, m2m_slots=m2m_k, m2g_slots=m2g_k,
        )
    else:
        graph1 = build_static_graph(
            gc, pos, g2m_pad=pad(counts["g2m"]), m2m_pad=pad(counts["m2m"]),
            m2g_pad=pad(counts["m2g"]),
        )
    return sim_cfg, stats, cfg, pos, counts, graph1


def main():
    sim_cfg, stats, cfg, pos, counts, graph1 = make_setup()
    graph = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (BATCH,) + a.shape), graph1
    )

    params = multi_scale_simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    rng = np.random.default_rng(0)
    batch = {
        "positions": jnp.asarray(pos[None, :, None, :] + rng.normal(
            scale=0.002, size=(BATCH, N, S, 2)).cumsum(2).astype(np.float32)),
        "next_position": jnp.asarray(pos[None] + rng.normal(
            scale=0.004, size=(BATCH, N, 2)).astype(np.float32)),
        "next_strain": jnp.asarray(rng.normal(size=(BATCH, N)).astype(np.float32)),
        "particle_type": jnp.zeros((BATCH, N), jnp.int32),
        "node_mask": jnp.ones((BATCH, N), bool),
        "graph": graph,
    }

    single = make_train_step(sim_cfg, stats, cfg, tx)

    @jax.jit
    def multi(state, batch, key):
        def body(carry, i):
            st, m = single(carry, batch, jax.random.fold_in(key, i))
            return st, m["train/loss"]

        return jax.lax.scan(body, state, jnp.arange(ITERS, dtype=jnp.uint32))

    state, losses = multi(state, batch, jax.random.key(1))
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        state, losses = multi(state, batch, jax.random.key(1))
    float(losses[-1])
    dt = (time.perf_counter() - t0) / (ITERS * ROUNDS)

    # edge updates: each edge type traversed by its blocks (g2m 1, m2m
    # M2M_LAYERS, m2g 1)
    updates = BATCH * (
        counts["g2m"] + counts["m2g"] + counts["m2m"] * M2M_LAYERS
    )
    print(json.dumps({
        "metric": "ms_edge_updates_per_s_per_chip",
        "value": round(updates / dt, 1),
        "unit": "edges/s",
        "step_time_ms": round(dt * 1e3, 2),
        "edges": counts,
        "loss": float(losses[-1]),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
