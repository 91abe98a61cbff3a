"""Scaling-efficiency benchmark: edges/s vs device count.

North-star metric (BASELINE.json): >=80% edges/s scaling efficiency from
1 chip -> 1 host -> N hosts. With one real TPU chip available this
harness measures what it can:
  * on real multi-chip hardware: true DP scaling over 1..num_devices,
  * on the 8-device virtual CPU mesh (JAX_PLATFORMS=cpu +
    --xla_force_host_platform_device_count=8): validates that the
    sharded program compiles/executes and reports indicative ratios
    (CPU numbers are NOT performance claims).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py --batch-per-device 2 --particles 512
"""

import argparse
import json
import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

from sgnn_tpu.parallel import make_mesh, make_dp_train_step
from sgnn_tpu.physics.simulator import NormStats, SimulatorConfig, simulator_init
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train import make_train_step


def _fence(x):
    """Real device fence: the remote-TPU tunnel's block_until_ready is
    not reliable (CLAUDE.md) — a scalar fetch is the only sync that
    provably drains the queue (same fix as bench.py). One leaf is
    enough: device execution is in-order, so materializing any output
    of the last step implies every prior step completed."""
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def lattice(n, spacing=0.5):
    ny = max(int(np.sqrt(n / 4)), 2)
    nx = -(-n // ny)
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing, indexing="ij")
    return np.stack([xs.ravel() - 1.0, ys.ravel()], -1).astype(np.float32)[:n]


def run_at(num_devices, batch_per_device, n_particles, layers, hidden, s, iters):
    mesh = make_mesh(data=num_devices, graph=1)
    b = batch_per_device * num_devices
    # Tuned single-chip config — identical knobs to bench.py's headline
    # (bf16 edge tensors, symmetric packed gathers, banded reverse
    # gathers) so devices=1 here IS the headline program and scaling
    # efficiency is measured against the real baseline (VERDICT r3 #2).
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=hidden, num_message_passing_steps=layers,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=20,
        neighbor_slots=8, domain=((-5.0, -30.0), (80.0, 30.0)),
        symmetric_gather=True, compute_dtype="bfloat16", band_nodes=64,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    cfg = TrainConfig(batch_size=b, noise_std=0.02, input_sequence_length=s,
                      hidden_dim=hidden, layers=layers)
    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    rng = np.random.default_rng(0)
    pos = lattice(n_particles)
    n = pos.shape[0]
    batch = {
        "positions": jnp.asarray(
            pos[None, :, None, :]
            + rng.normal(scale=0.002, size=(b, n, s, 2)).cumsum(2).astype(np.float32)),
        "next_position": jnp.asarray(
            pos[None] + rng.normal(scale=0.004, size=(b, n, 2)).astype(np.float32)),
        "next_strain": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)),
        "particle_type": jnp.zeros((b, n), jnp.int32),
        "node_mask": jnp.ones((b, n), bool),
    }
    from sgnn_tpu.physics.simulator import compute_neighbors

    edges = int(compute_neighbors(sim_cfg, batch["positions"][0, :, -1]).count_edges())
    step = make_dp_train_step(make_train_step(sim_cfg, stats, cfg, tx), mesh)
    key = jax.random.key(1)
    state, m = step(state, batch, key)
    _fence(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key)
    _fence(m)
    dt = (time.perf_counter() - t0) / iters
    return {
        "devices": num_devices,
        "global_batch": b,
        "step_time_ms": round(dt * 1e3, 2),
        "edges_per_s": round(b * edges * layers / dt, 1),
    }


def run_graph_at(num_shards, n_particles, layers, hidden, s, iters):
    """Edge-partitioned full train step over `num_shards` graph shards.

    One FIXED-SIZE graph (strong scaling: same N, more chips) — the
    designed answer to the single-chip large-graph cliff (BASELINE.md
    capacity sweep). Uses the production per-shard celltable search.
    """
    import optax

    from sgnn_tpu.parallel.edge_partition import (
        make_partitioned_train_step,
        partition_plan,
        scatter_to_shards,
    )

    mesh = make_mesh(data=1, graph=num_shards)
    rng = np.random.default_rng(0)
    pos = lattice(n_particles)
    n = pos.shape[0]
    lo, hi = pos.min(0) - 1.0, pos.max(0) + 1.0
    # bf16 edge tensors + the ext-table symmetric-gather VJP flow
    # through the partitioned forward since r4 (it runs
    # epd_flat._process_decode with the halo gather hook); banded
    # gathers stay single-chip machinery (per-shard tables are small).
    # GRAPH_BAND=1: per-shard banded gathers (r5 — the lattice feed is
    # x-major sorted, same band bound as the single-chip sweep); REMAT
    # env mirrors scripts/size_sweep.py for capacity-scale anchors.
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=hidden, num_message_passing_steps=layers,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=20,
        neighbor_slots=8, domain=(tuple(lo.tolist()), tuple(hi.tolist())),
        compute_dtype="bfloat16", symmetric_gather=True,
        band_nodes=(
            2 * max(int(np.sqrt(n_particles / 4)), 2) + 16
            if os.environ.get("GRAPH_BAND") else None
        ),
        remat=(os.environ.get("REMAT") or n_particles >= 500_000),
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    spec, order = partition_plan(pos, num_shards, sim_cfg.connectivity_radius)
    seq = (
        pos[:, None, :]
        + rng.normal(scale=0.002, size=(n, s, 2)).cumsum(1)
    ).astype(np.float32)
    seq_p = scatter_to_shards(seq, order, spec)
    nt = spec.total_nodes
    mask = np.zeros(nt, bool)
    mask[:n] = True
    batch = {
        "positions": jnp.asarray(seq_p),
        "next_position": jnp.asarray(seq_p[:, -1] + 0.01),
        "next_strain": jnp.zeros((nt,), jnp.float32),
        "particle_type": jnp.zeros((nt,), jnp.int32),
        "node_mask": jnp.asarray(mask),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P

    node_shard = NamedSharding(mesh, P("graph"))
    batch = {k: jax.device_put(v, node_shard) for k, v in batch.items()}

    from sgnn_tpu.physics.simulator import compute_neighbors

    edges = int(compute_neighbors(sim_cfg, jnp.asarray(pos)).count_edges())
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    state = jax.device_put(state, NamedSharding(mesh, P()))
    key = jax.random.key(1)
    # SCAN=K: K optimizer steps per dispatch via the production
    # make_partitioned_multi_step (lax.scan) — removes per-dispatch host
    # RTT from the anchor the same way bench.py's scanned loop does for
    # the headline (tunnel dispatch noise is several ms on sub-30 ms
    # programs; see CLAUDE.md).
    scan_k = int(os.environ.get("SCAN", "0"))
    if scan_k:
        from sgnn_tpu.parallel.edge_partition import make_partitioned_multi_step

        batches = jax.tree.map(
            lambda v: jax.device_put(
                jnp.broadcast_to(v[None], (scan_k,) + v.shape),
                NamedSharding(mesh, P(None, "graph")),
            ),
            batch,
        )
        mstep = make_partitioned_multi_step(mesh, sim_cfg, stats, spec, tx,
                                            scan_k, noise_std=0.001)
        state, m = mstep(state, batches, key)
        _fence(m)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = mstep(state, batches, key)
        _fence(m)
        m = jax.tree.map(lambda v: v[-1], m)
        dt = (time.perf_counter() - t0) / (iters * scan_k)
    else:
        step = make_partitioned_train_step(mesh, sim_cfg, stats, spec, tx,
                                           noise_std=0.001)
        state, m = step(state, batch, key)
        _fence(m)
        if os.environ.get("GRAPH_TRACE"):  # per-op trace of the sharded step
            from sgnn_tpu.utils.profiling import start_trace, stop_trace, summarize_trace

            start_trace(os.environ["GRAPH_TRACE"])
            for _ in range(3):
                state, m = step(state, batch, key)
            _fence(m)
            stop_trace()
            for row in summarize_trace(os.environ["GRAPH_TRACE"], top=30):
                print(row)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, key)
        _fence(m)
        dt = (time.perf_counter() - t0) / iters
    return {
        "shards": num_shards,
        "nodes": n,
        "halo": spec.halo,
        "step_time_ms": round(dt * 1e3, 2),
        "edges_per_s": round(edges * layers / dt, 1),
        "halo_violations": int(m["train/halo_violations"]),
    }


def run_ms_graph_at(num_shards, n_particles, layers, hidden, s, iters):
    """Graph-axis-partitioned MULTI-SCALE full train step (strong scaling).

    The ms counterpart of run_graph_at: one static 2-scale hierarchy
    over a fixed lattice, slab-partitioned with exact host plans
    (parallel/ms_partition.py). Records the real-TPU anchor the r3
    verdict flagged as missing.
    """
    from sgnn_tpu.parallel.ms_partition import (
        make_ms_partitioned_train_step,
        plan_ms_partition,
    )
    from sgnn_tpu.physics.multi_scale_simulator import (
        MultiScaleSimulatorConfig,
        multi_scale_simulator_init,
    )

    mesh = make_mesh(data=1, graph=num_shards)
    rng = np.random.default_rng(0)
    pos = lattice(n_particles)
    n = pos.shape[0]
    sim_cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=hidden, num_message_passing_steps=layers,
        input_sequence_length=s, num_scales=2, window_size=2,
        compute_dtype="bfloat16",
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    # MS_DENSE=1: per-shard dense-slot plans (r5 — the fast layout under
    # partitioning); default COO matches the r3/r4 anchor rows
    # MS_HALO: pin the halo width (e.g. MS_HALO=0 at shards=1 isolates
    # the per-block halo-exchange cost against the matched ms_single row)
    spec, order, sgraph = plan_ms_partition(
        sim_cfg.graph_config, pos, num_shards,
        layout="dense" if os.environ.get("MS_DENSE") else "coo",
        halo=(int(os.environ["MS_HALO"]) if "MS_HALO" in os.environ else None),
    )
    s_ms = s  # --seq flows through (ADVICE r4: was hardcoded to 2)
    seq = (
        pos[order][:, None, :]
        + rng.normal(scale=0.002, size=(n, s_ms, 2)).cumsum(1)
    ).astype(np.float32)
    nt = spec.total_nodes
    seq_p = np.zeros((nt, s_ms, 2), np.float32)
    seq_p[:n] = seq
    mask = np.zeros(nt, bool)
    mask[:n] = True
    counts = {
        t: int(e.mask.sum() if hasattr(e, "mask")
               else sum(d.mask.sum() for d in e))  # dense m2m: per-scale tuple
        for t in ("g2m", "m2m", "m2g")
        for e in [getattr(sgraph, t)]
    }
    batch = {
        "positions": jnp.asarray(seq_p),
        "next_position": jnp.asarray(seq_p[:, -1] + 0.01),
        "next_strain": jnp.zeros((nt,), jnp.float32),
        "particle_type": jnp.zeros((nt,), jnp.int32),
        "node_mask": jnp.asarray(mask),
        "graph": jax.tree.map(jnp.asarray, sgraph),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P

    node_shard = NamedSharding(mesh, P("graph"))
    batch = {k: jax.tree.map(lambda v: jax.device_put(v, node_shard), v)
             if k == "graph" else jax.device_put(v, node_shard)
             for k, v in batch.items()}
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    state = jax.device_put(state, NamedSharding(mesh, P()))
    key = jax.random.key(1)
    # SCAN=K: K steps per dispatch (see run_graph_at) — the ms batch
    # leaves INCLUDING the static graph arrays carry the scan axis.
    scan_k = int(os.environ.get("SCAN", "0"))
    if scan_k:
        from sgnn_tpu.parallel.ms_partition import make_ms_partitioned_multi_step

        batches = jax.tree.map(
            lambda v: jax.device_put(
                jnp.broadcast_to(v[None], (scan_k,) + v.shape),
                NamedSharding(mesh, P(None, "graph")),
            ),
            batch,
        )
        mstep = make_ms_partitioned_multi_step(mesh, sim_cfg, stats, spec, tx,
                                               scan_k, noise_std=0.001)
        state, m = mstep(state, batches, key)
        _fence(m)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = mstep(state, batches, key)
        _fence(m)
        dt = (time.perf_counter() - t0) / (iters * scan_k)
    else:
        step = make_ms_partitioned_train_step(mesh, sim_cfg, stats, spec, tx,
                                              noise_std=0.001)
        state, m = step(state, batch, key)
        _fence(m)
        if os.environ.get("MS_TRACE"):  # per-op trace of the sharded step
            from sgnn_tpu.utils.profiling import start_trace, stop_trace, summarize_trace

            start_trace(os.environ["MS_TRACE"])
            for _ in range(3):
                state, m = step(state, batch, key)
            _fence(m)
            stop_trace()
            for row in summarize_trace(os.environ["MS_TRACE"], top=25):
                print(row)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, key)
        _fence(m)
        dt = (time.perf_counter() - t0) / iters
    updates = counts["g2m"] + counts["m2g"] + counts["m2m"] * layers
    return {
        "shards": num_shards,
        "nodes": n,
        "halo": spec.halo,
        "edges": counts,
        "step_time_ms": round(dt * 1e3, 2),
        "edges_per_s": round(updates / dt, 1),
    }


def run_ms_single_at(n_particles, layers, hidden, s, iters):
    """Matched-batch SINGLE-CHIP ms anchor: B=1, same lattice/model/seq
    as run_ms_graph_at, single-device train step (the base the ms_graph
    shards=1 rows compare against — VERDICT r4 #4a). MS_DENSE=1 uses the
    dense layout (tight per-type/per-scale slots), default COO."""
    from sgnn_tpu.physics.multi_scale_graph import (
        build_dense_static_graph,
        build_static_graph,
        create_all_edges,
    )
    from sgnn_tpu.physics.multi_scale_simulator import (
        MultiScaleSimulatorConfig,
        multi_scale_simulator_init,
    )
    from sgnn_tpu.train.train_multi_scale import make_train_step as ms_step

    rng = np.random.default_rng(0)
    pos = lattice(n_particles)
    n = pos.shape[0]
    sim_cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=hidden, num_message_passing_steps=layers,
        input_sequence_length=s, num_scales=2, window_size=2,
        compute_dtype="bfloat16",
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    gc = sim_cfg.graph_config
    all_edges = create_all_edges(gc, pos)
    counts = {
        "g2m": len(all_edges["grid2mesh_edges"].senders),
        "m2m": len(all_edges["mesh2mesh_edges"].senders),
        "m2g": len(all_edges["mesh2grid_edges"].senders),
    }
    if os.environ.get("MS_DENSE"):
        def deg(e):
            c = np.bincount(np.asarray(e.receivers))
            nz = c[c > 0]
            return len(nz), int(nz.max())

        g2m_r, g2m_k = deg(all_edges["grid2mesh_edges"])
        m2g_r, m2g_k = deg(all_edges["mesh2grid_edges"])
        ms_stats = [deg(e) for e in all_edges["mesh2mesh_edges_per_scale"]]
        rpad = lambda r: -(-r // 128) * 128
        graph1 = build_dense_static_graph(
            gc, pos, g2m_rows=rpad(g2m_r), m2g_rows=rpad(m2g_r),
            m2m_rows=[rpad(r) for r, _ in ms_stats],
            g2m_slots=g2m_k, m2g_slots=m2g_k,
            m2m_slots=[k for _, k in ms_stats],
        )
    else:
        pad = lambda e: -(-e // 1024) * 1024
        graph1 = build_static_graph(
            gc, pos, g2m_pad=pad(counts["g2m"]), m2m_pad=pad(counts["m2m"]),
            m2g_pad=pad(counts["m2g"]),
        )
    graph = jax.tree.map(lambda a: jnp.asarray(a)[None], graph1)
    params = multi_scale_simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    cfg = TrainConfig(batch_size=1, noise_std=0.001, input_sequence_length=s,
                      hidden_dim=hidden, layers=layers,
                      num_scales=2, window_size=2)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    seq = (pos[None, :, None, :] + rng.normal(
        scale=0.002, size=(1, n, s, 2)).cumsum(2)).astype(np.float32)
    batch = {
        "positions": jnp.asarray(seq),
        "next_position": jnp.asarray(seq[:, :, -1] + 0.01),
        "next_strain": jnp.zeros((1, n), jnp.float32),
        "particle_type": jnp.zeros((1, n), jnp.int32),
        "node_mask": jnp.ones((1, n), bool),
        "graph": graph,
    }
    key = jax.random.key(1)
    scan_k = int(os.environ.get("SCAN", "0"))
    if scan_k:  # K steps/dispatch — same protocol as the sharded rows
        from sgnn_tpu.train.train_multi_scale import make_train_multi_step

        batches = jax.tree.map(
            lambda v: jnp.broadcast_to(v[None], (scan_k,) + v.shape), batch)
        mstep = make_train_multi_step(sim_cfg, stats, cfg, tx, scan_k)
        state, m = mstep(state, batches, key)
        _fence(m)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = mstep(state, batches, key)
        _fence(m)
        dt = (time.perf_counter() - t0) / (iters * scan_k)
    else:
        step = ms_step(sim_cfg, stats, cfg, tx)
        state, m = step(state, batch, key)
        _fence(m)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, key)
        _fence(m)
        dt = (time.perf_counter() - t0) / iters
    updates = counts["g2m"] + counts["m2g"] + counts["m2m"] * layers
    return {
        "shards": 1,
        "mode": "ms_single",
        "layout": "dense" if os.environ.get("MS_DENSE") else "coo",
        "nodes": n,
        "edges": counts,
        "step_time_ms": round(dt * 1e3, 2),
        "edges_per_s": round(updates / dt, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["dp", "graph", "ms_graph", "ms_single"],
                   default="dp")
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--particles", type=int, default=1024)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--seq", type=int, default=11)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    total = len(jax.devices())
    counts = [c for c in [1, 2, 4, 8, 16, 32] if c <= total]
    if args.mode == "ms_single":
        counts = [1]
    results = []
    for c in counts:
        if args.mode == "ms_single":
            r = run_ms_single_at(args.particles, args.layers, args.hidden,
                                 args.seq, args.iters)
        elif args.mode == "graph":
            r = run_graph_at(c, args.particles, args.layers, args.hidden,
                             args.seq, args.iters)
        elif args.mode == "ms_graph":
            r = run_ms_graph_at(c, args.particles, args.layers, args.hidden,
                                args.seq, args.iters)
        else:
            r = run_at(c, args.batch_per_device, args.particles, args.layers,
                       args.hidden, args.seq, args.iters)
        results.append(r)
        print(json.dumps(r))
    if len(results) > 1:
        base = results[0]["edges_per_s"]
        # dp = weak scaling (global batch grows with devices); graph =
        # strong scaling (fixed graph, more shards). Both normalize
        # throughput by linear speedup off the 1-device anchor.
        key = "devices" if args.mode == "dp" else "shards"
        eff = [round(r["edges_per_s"] / (base * r[key]), 3) for r in results]
        print(json.dumps({
            "metric": f"{args.mode}_scaling_efficiency",
            key: [r[key] for r in results],
            "efficiency_vs_linear": eff,
            "platform": jax.devices()[0].platform,
            "note": "CPU-mesh numbers validate the sharded program only; "
                    "true ICI scaling needs multi-chip hardware",
        }))


if __name__ == "__main__":
    main()
