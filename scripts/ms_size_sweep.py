"""Multi-scale throughput vs graph size: the large-N evidence the
hierarchy exists for.

The reference's multi-scale family exists precisely to make long-range
coupling tractable on big graphs
(/root/reference/sgnn/multi_scale/multi_scale_graph.py:47-94), but the
r3 ms benches stopped at N=4797 (VERDICT r3 missing #2). This sweep
mirrors scripts/size_sweep.py for the ms training step: same lattice
generator, same dependency-chained scan harness, dense and COO layouts,
scales grown with N (window^scales stride keeps the coarsest mesh a
roughly fixed fraction of the graph).

Usage:
  python scripts/ms_size_sweep.py            # all entries
  python scripts/ms_size_sweep.py <i>        # one entry (compiles are minutes)
  MS_COO=1 python scripts/ms_size_sweep.py   # COO layout instead of dense
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
from sgnn_tpu.physics.multi_scale_graph import (
    build_dense_static_graph,
    build_static_graph,
    create_all_edges,
)
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    NormStats,
    multi_scale_simulator_init,
)
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train_multi_scale import make_train_step

S, M2M_LAYERS, HIDDEN, ITERS, ROUNDS = 2, 6, 64, 10, 3


def run_one(n_particles, batch, num_scales):
    pos = bench.lattice(n_particles)
    n = pos.shape[0]
    sim_cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=HIDDEN, num_message_passing_steps=M2M_LAYERS,
        input_sequence_length=S, num_scales=num_scales, window_size=2,
        compute_dtype="float32" if os.environ.get("MS_F32") else "bfloat16",
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    cfg = TrainConfig(batch_size=batch, noise_std=0.02, input_sequence_length=S,
                      hidden_dim=HIDDEN, layers=M2M_LAYERS,
                      num_scales=num_scales, window_size=2)
    gc = sim_cfg.graph_config
    all_edges = create_all_edges(gc, pos)
    counts = {
        "g2m": len(all_edges["grid2mesh_edges"].senders),
        "m2m": len(all_edges["mesh2mesh_edges"].senders),
        "m2g": len(all_edges["mesh2grid_edges"].senders),
    }
    if not os.environ.get("MS_COO"):
        def deg_stats(e):
            cnt = np.bincount(np.asarray(e.receivers))
            nz = cnt[cnt > 0]
            return len(nz), int(nz.max())

        (g2m_r, g2m_k) = deg_stats(all_edges["grid2mesh_edges"])
        (m2g_r, m2g_k) = deg_stats(all_edges["mesh2grid_edges"])
        # per-scale m2m sizing: each scale keeps its own tight K instead
        # of the concatenated set's summed degree at coarse nodes
        ms_stats = [deg_stats(e) for e in all_edges["mesh2mesh_edges_per_scale"]]
        rpad = lambda r: -(-r // 128) * 128
        graph1 = build_dense_static_graph(
            gc, pos,
            g2m_rows=rpad(g2m_r), m2g_rows=rpad(m2g_r),
            m2m_rows=[rpad(r) for r, _ in ms_stats],
            g2m_slots=g2m_k, m2g_slots=m2g_k,
            m2m_slots=[k for _, k in ms_stats],
        )
        slot_rows = sum(rpad(r) * k for r, k in ms_stats)
        print(f"m2m per-scale slots: {ms_stats} -> {slot_rows} slot rows "
              f"for {counts['m2m']} edges")
        layout = "dense"
    else:
        pad = lambda e: -(-e // 1024) * 1024
        graph1 = build_static_graph(
            gc, pos, g2m_pad=pad(counts["g2m"]), m2m_pad=pad(counts["m2m"]),
            m2g_pad=pad(counts["m2g"]),
        )
        layout = "coo"
    graph = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (batch,) + a.shape), graph1
    )

    params = multi_scale_simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    rng = np.random.default_rng(0)
    b = batch
    batch_data = {
        "positions": jnp.asarray(pos[None, :, None, :] + rng.normal(
            scale=0.002, size=(b, n, S, 2)).cumsum(2).astype(np.float32)),
        "next_position": jnp.asarray(pos[None] + rng.normal(
            scale=0.004, size=(b, n, 2)).astype(np.float32)),
        "next_strain": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)),
        "particle_type": jnp.zeros((b, n), jnp.int32),
        "node_mask": jnp.ones((b, n), bool),
        "graph": graph,
    }

    single = make_train_step(sim_cfg, stats, cfg, tx)

    @jax.jit
    def multi(state, batch, key):
        def body(carry, i):
            st, m = single(carry, batch, jax.random.fold_in(key, i))
            return st, m["train/loss"]

        return jax.lax.scan(body, state, jnp.arange(ITERS, dtype=jnp.uint32))

    state, losses = multi(state, batch_data, jax.random.key(1))
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        state, losses = multi(state, batch_data, jax.random.key(1))
    float(losses[-1])
    dt = (time.perf_counter() - t0) / (ITERS * ROUNDS)
    updates = b * (counts["g2m"] + counts["m2g"] + counts["m2m"] * M2M_LAYERS)
    return {
        "n_particles": n, "batch": b, "scales": num_scales, "layout": layout,
        "edges": counts, "step_ms": round(dt * 1e3, 2),
        "edge_updates_per_s": round(updates / dt, 1),
        "loss": float(losses[-1]),
    }


def main():
    # scales grow with N so the coarsest mesh keeps long-range reach
    entries = [(4797, 8, 2), (19188, 2, 2), (76752, 1, 3), (307008, 1, 3)]
    if len(sys.argv) > 1:
        i = int(sys.argv[1])
        entries = entries[i : i + 1]
    for n, b, sc in entries:
        try:
            print(json.dumps(run_one(n, b, sc)))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"n_particles": n, "batch": b, "scales": sc,
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}))


if __name__ == "__main__":
    main()
