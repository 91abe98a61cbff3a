"""Capture a jax.profiler trace of the bench train step and summarize it.

Usage:  python scripts/profile_step.py [logdir]

Reuses bench.py's exact configuration (B=8, N=4797, 5 layers, h=64,
bf16, slots=8) so per-op times map 1:1 onto the BASELINE.md ledger.
Prints the top ops by device time plus a category rollup via
sgnn_tpu.utils.profiling.summarize_trace.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgnn_trace"
    import bench
    from sgnn_tpu.physics.simulator import NormStats, SimulatorConfig, simulator_init
    from sgnn_tpu.train.config import TrainConfig
    from sgnn_tpu.train.train import make_train_step
    from sgnn_tpu.utils.profiling import start_trace, stop_trace, summarize_trace

    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=bench.HIDDEN, num_message_passing_steps=bench.LAYERS,
        input_sequence_length=bench.S, connectivity_radius=0.6, max_neighbors=20,
        neighbor_slots=8, domain=((-5.0, -30.0), (80.0, 30.0)),
        symmetric_gather=True, compute_dtype="bfloat16",
    )
    stats = NormStats(vel_mean=jnp.zeros(2), vel_std=jnp.ones(2),
                      acc_mean=jnp.zeros(2), acc_std=jnp.ones(2))
    cfg = TrainConfig(batch_size=bench.BATCH, noise_std=0.02,
                      input_sequence_length=bench.S, hidden_dim=bench.HIDDEN,
                      layers=bench.LAYERS)
    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    rng = np.random.default_rng(0)
    pos = bench.lattice(bench.N_PARTICLES)
    n = pos.shape[0]
    b = bench.BATCH
    batch = {
        "positions": jnp.asarray(pos[None, :, None, :] + rng.normal(
            scale=0.002, size=(b, n, bench.S, 2)).cumsum(2).astype(np.float32)),
        "next_position": jnp.asarray(pos[None] + rng.normal(
            scale=0.004, size=(b, n, 2)).astype(np.float32)),
        "next_strain": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)),
        "particle_type": jnp.zeros((b, n), jnp.int32),
        "node_mask": jnp.ones((b, n), bool),
    }
    train_step = make_train_step(sim_cfg, stats, cfg, tx)
    key = jax.random.key(1)
    for _ in range(3):
        state, metrics = train_step(state, batch, key)
    float(jnp.sum(metrics["train/loss"]))

    start_trace(logdir)
    for _ in range(5):
        state, metrics = train_step(state, batch, key)
    float(jnp.sum(metrics["train/loss"]))
    stop_trace()

    # Join per-op device times with HLO source metadata: dump the compiled
    # module once and map %op names -> (shape, source_file:line).
    import re

    hlo = train_step.lower(state, batch, key).compile().as_text()
    src = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = (\S+)", line)
        if not m:
            continue
        sm = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
        src[m.group(1)] = (
            m.group(2)[:46],
            f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else "",
        )

    rows = summarize_trace(logdir, top=60)
    for r in rows:
        name = r["name"].lstrip("%").split(" ")[0]
        shape, where = src.get(name, ("", ""))
        print(
            f"{r['ms_per_step']:9.3f} ms  {r['category']:6s}  "
            f"{name[:28]:28s} {shape:46s} {where}"
        )


if __name__ == "__main__":
    main()
