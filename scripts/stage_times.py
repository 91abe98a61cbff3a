"""Stage-level timings of the bench step, measured as on-device scans.

Through the remote-TPU tunnel, per-dispatch latency (~25 ms) swamps any
sub-program timed with a Python loop; every stage here runs ITERS
dependency-chained iterations inside ONE jitted lax.scan, so the
reported per-iteration time is pure device time (plus one dispatch,
amortized).

Usage: python scripts/stage_times.py
"""

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
from sgnn_tpu.ops.neighbors import radius_neighbors_celltable
from sgnn_tpu.physics.noise import random_walk_position_noise
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    forward_batched,
    simulator_init,
)
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train import make_train_multi_step

ITERS = 20
DOMAIN = ((-5.0, -30.0), (80.0, 30.0))


def scan_time(body, init, iters=ITERS):
    """Time `iters` dependency-chained body() calls in one dispatch (ms)."""

    @jax.jit
    def run(x):
        def f(carry, i):
            return body(carry, i), ()

        out, _ = jax.lax.scan(f, x, jnp.arange(iters, dtype=jnp.int32))
        return out

    out = run(init)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # warm + fence
    t0 = time.perf_counter()
    out = run(init)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=bench.HIDDEN, num_message_passing_steps=bench.LAYERS,
        input_sequence_length=bench.S, connectivity_radius=0.6, max_neighbors=20,
        neighbor_slots=8, domain=DOMAIN, symmetric_gather=True,
        compute_dtype="bfloat16",
    )
    stats = NormStats(vel_mean=jnp.zeros(2), vel_std=jnp.ones(2),
                      acc_mean=jnp.zeros(2), acc_std=jnp.ones(2))
    cfg = TrainConfig(batch_size=bench.BATCH, noise_std=0.02,
                      input_sequence_length=bench.S, hidden_dim=bench.HIDDEN,
                      layers=bench.LAYERS)
    params = simulator_init(jax.random.key(0), sim_cfg)
    rng = np.random.default_rng(0)
    pos = bench.lattice(bench.N_PARTICLES)
    n, b, S = pos.shape[0], bench.BATCH, bench.S
    seqs = jnp.asarray(pos[None, :, None, :] + rng.normal(
        scale=0.002, size=(b, n, S, 2)).cumsum(2).astype(np.float32))
    types = jnp.zeros((b, n), jnp.int32)
    mask = jnp.ones((b, n), bool)

    # noise: key folded per iter; carry xor-accumulates into the positions
    def noise_body(carry, i):
        z = random_walk_position_noise(jax.random.fold_in(jax.random.key(0), i),
                                       carry.shape, 0.02)
        return carry + 1e-9 * z, None

    t = scan_time(lambda c, i: noise_body(c, i)[0], seqs)
    print(f"noise           {t:6.2f} ms")

    # search: perturb positions per iter so nothing is constant-folded
    def search_body(carry, i):
        p = carry + 1e-9 * jnp.float32(i)
        nl = radius_neighbors_celltable(
            p[..., -1, :], 0.6, domain_min=DOMAIN[0], domain_max=DOMAIN[1],
            max_neighbors=8, node_mask=mask)
        return carry + 1e-9 * jnp.sum(nl.mask), None

    t = scan_time(lambda c, i: search_body(c, i)[0], seqs)
    print(f"search          {t:6.2f} ms")

    # forward (search + features + 5 layers + decode)
    def fwd_body(carry, i):
        p = carry + 1e-9 * jnp.float32(i)
        nxt, strain = forward_batched(params, sim_cfg, stats, p, types, mask)
        return carry + 1e-9 * jnp.sum(nxt.astype(jnp.float32)), None

    t = scan_time(lambda c, i: fwd_body(c, i)[0], seqs)
    print(f"fwd incl search {t:6.2f} ms")

    # full train step (the bench number, same harness)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    batch = {
        "positions": seqs,
        "next_position": jnp.asarray(pos[None] + rng.normal(
            scale=0.004, size=(b, n, 2)).astype(np.float32)),
        "next_strain": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)),
        "particle_type": types,
        "node_mask": mask,
    }
    multi = make_train_multi_step(sim_cfg, stats, cfg, tx, num_steps=ITERS)
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (ITERS,) + x.shape), batch)
    state, m = multi(state, stacked, jax.random.key(1))
    float(m["train/loss"][-1])
    t0 = time.perf_counter()
    state, m = multi(state, stacked, jax.random.key(1))
    float(m["train/loss"][-1])
    print(f"full step       {(time.perf_counter()-t0)/ITERS*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
