"""Benchmark: edges/s/chip through the message-passing training step.

Runs the flagship single-scale training step (noise + radius graph +
5-layer encode-process-decode + loss + Adam) at reference scale
(~4797 particles/graph, r=0.6, K=20, hidden 64, 11-frame window) on the
available accelerator and reports the north-star metric from
BASELINE.json: message-passing edge updates per second per chip
(real edges x message-passing layers / step time).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is self-measured: the round-1 value recorded in BASELINE.md
(BASELINE_EDGES_PER_S). Ratios > 1 mean speedup over round 1.
"""

import json
import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: first compiles through the remote-TPU
# tunnel take minutes; cached reruns load in seconds.
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from sgnn_tpu.physics.simulator import NormStats, SimulatorConfig, simulator_init
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train import make_train_multi_step

# Self-baseline: first end-to-end measurement (round 1, unoptimized XLA-only
# path, TPU v5e, 2026-08-17; recorded in BASELINE.md). vs_baseline > 1 means
# speedup over that starting point.
BASELINE_EDGES_PER_S = 3.368e6

BATCH = 8
N_PARTICLES = 4797
S = 11
LAYERS = 5
HIDDEN = 64
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def lattice(n, spacing=0.5):
    ny = max(int(np.sqrt(n / 4)), 2)
    nx = -(-n // ny)
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing, indexing="ij")
    pos = np.stack([xs.ravel() - 1.0, ys.ravel()], -1).astype(np.float32)
    return pos[:n]


def main():
    dev = jax.devices()[0]
    sim_cfg = SimulatorConfig(
        dim=2,
        latent_dim=HIDDEN,
        num_message_passing_steps=LAYERS,
        input_sequence_length=S,
        connectivity_radius=0.6,
        max_neighbors=20,
        # The bench lattice's true max degree is 5 (self + 4 axial at
        # r=0.6 on 0.5 spacing); 8 slots keep exact cap-20 semantics while
        # shrinking edge tensors/gathers 2.5x (see neighbor_slots doc).
        # slots=7 (the trainer's auto rule) was measured SLOWER (31.3 vs
        # 30.6 ms/step): the 12.5% row reduction loses to odd-width
        # sublane tiling. Keep slot widths a multiple of 8.
        neighbor_slots=8,
        domain=((-5.0, -30.0), (80.0, 30.0)),
        # Valid because max degree (5) <= slots (8): the radius graph is
        # symmetric, so sender-gather VJPs can run as reverse-index
        # gathers instead of scatters (ops/sym_gather.py). Measured
        # 71 -> 56 ms/step together with bf16 edge latents; neither
        # helps alone (scatters dominate the f32 bwd; see BASELINE.md).
        symmetric_gather=True,
        compute_dtype="bfloat16",
        # The lattice is x-major sorted; CLEAN neighbors sit within one
        # x-column (ny = sqrt(N/4) ~ 34 rows) but the training noise
        # (double-cumsum, sigma ~0.12) bridges ~1% of two-column pairs
        # under r=0.6, so the band covers two columns (r5 guard finding;
        # banding is INACTIVE at headline scale anyway — tables are
        # below the 450k-row threshold — so this is metric hygiene, not
        # a perf change).
        band_nodes=88,
    )
    stats = NormStats(
        vel_mean=jnp.zeros(2), vel_std=jnp.ones(2),
        acc_mean=jnp.zeros(2), acc_std=jnp.ones(2),
    )
    cfg = TrainConfig(
        batch_size=BATCH, noise_std=0.02, input_sequence_length=S,
        hidden_dim=HIDDEN, layers=LAYERS,
    )

    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }

    rng = np.random.default_rng(0)
    pos = lattice(N_PARTICLES)
    n = pos.shape[0]
    batch = {
        "positions": jnp.asarray(
            pos[None, :, None, :]
            + rng.normal(scale=0.002, size=(BATCH, n, S, 2)).cumsum(2).astype(np.float32)
        ),
        "next_position": jnp.asarray(
            pos[None] + rng.normal(scale=0.004, size=(BATCH, n, 2)).astype(np.float32)
        ),
        "next_strain": jnp.asarray(rng.normal(size=(BATCH, n)).astype(np.float32)),
        "particle_type": jnp.zeros((BATCH, n), jnp.int32),
        "node_mask": jnp.ones((BATCH, n), bool),
    }

    # Count real edges once (same positions the step sees, minus noise).
    from sgnn_tpu.physics.simulator import compute_neighbors

    nl = compute_neighbors(sim_cfg, batch["positions"][0, :, -1])
    edges_per_graph = int(nl.count_edges())

    key = jax.random.key(1)

    def sync(x):
        # The remote-TPU tunnel's block_until_ready is not a reliable fence;
        # fetching a scalar is.
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    # Steady-state loop: ITERS optimizer steps per dispatch via lax.scan
    # (make_train_multi_step) — the TPU-idiomatic driver the trainer uses
    # for inner_steps > 1. One dispatch amortizes host/runtime launch
    # latency (~1 ms/step through this environment's remote-TPU tunnel).
    multi_step = make_train_multi_step(sim_cfg, stats, cfg, tx, num_steps=ITERS)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (ITERS,) + x.shape), batch
    )
    for _ in range(max(WARMUP // 2, 1)):
        state, metrics = multi_step(state, stacked, key)
    sync(metrics)

    rounds = 3  # 3 dispatches x ITERS steps, state-chained
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, metrics = multi_step(state, stacked, key)
    sync(metrics)
    dt = (time.perf_counter() - t0) / (ITERS * rounds)
    metrics = jax.tree.map(lambda x: x[-1], metrics)

    edge_updates = BATCH * edges_per_graph * LAYERS
    edges_per_s = edge_updates / dt

    # Secondary: inference (forward-only) throughput — search + features +
    # message passing, no grads/optimizer. Opt-in (BENCH_INFERENCE=1): the
    # extra compile through the remote-TPU tunnel costs minutes.
    dt_fwd = None
    from sgnn_tpu.physics.simulator import forward_batched

    fwd = jax.jit(
        lambda p, s: forward_batched(
            p, sim_cfg, stats, s, batch["particle_type"], batch["node_mask"]
        )
    )
    if os.environ.get("BENCH_INFERENCE"):
        inputs = [batch["positions"] + 1e-6 * i for i in range(ITERS + 1)]
        out = fwd(state["params"], inputs[0])
        sync(out)
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fwd(state["params"], inputs[i + 1])
        sync(out)
        dt_fwd = (time.perf_counter() - t0) / ITERS

    print(
        json.dumps(
            {
                "metric": "mp_edge_updates_per_s_per_chip",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
                "step_time_ms": round(dt * 1e3, 2),
                **(
                    {
                        "inference_edges_per_s": round(edge_updates / dt_fwd, 1),
                        "inference_time_ms": round(dt_fwd * 1e3, 2),
                    }
                    if dt_fwd
                    else {}
                ),
                "edges_per_graph": edges_per_graph,
                "batch": BATCH,
                "layers": LAYERS,
                "hidden": HIDDEN,
                "n_particles": n,
                "device": str(dev),
                "loss": float(metrics["train/loss"]),
            }
        )
    )


if __name__ == "__main__":
    main()
