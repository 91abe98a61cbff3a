"""Bisect the 1.2M-node compile failure (VERDICT r4 #2 / r5).

The r4 hypothesis — single buffers crossing 2^31 bytes via the packed
3-stream gather — was falsified this round: with the packed gather
routed off (simulator.packed_gather_max_nodes) the train step still
fails with the same remote-compile HTTP 500. This probe isolates WHICH
program construct fails at a given N:

  python scripts/bisect_12m.py <n_particles> <mode>

modes: fwd (forward only), loss (fwd + loss), grad (value_and_grad),
step (full train step incl. Adam). Env flags toggle program features
for any mode: BAND=0 (no banded gathers), REMAT=0 / REMAT=xj_msg,
SYM=0 (plain scatter VJP instead of the symmetric gather VJP).
Prints COMPILE OK / the full failure.
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

from scripts.size_sweep import lattice
from scripts.size_sweep import HIDDEN as _H, LAYERS as _L, S as _S

# H/LAYERS/SEQ env overrides: halving HIDDEN halves every edge-tensor
# byte count, separating memory-scaling failures from index/count limits
HIDDEN = int(os.environ.get("H", _H))
LAYERS = int(os.environ.get("L", _L))
S = int(os.environ.get("SEQ", _S))
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    forward_batched,
    predict_accelerations_batched,
    simulator_init,
)
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train import make_train_step


def main():
    n_particles = int(sys.argv[1]) if len(sys.argv) > 1 else 1_228_032
    mode = sys.argv[2] if len(sys.argv) > 2 else "step"

    pos = lattice(n_particles)
    n = pos.shape[0]
    extent = (pos.min(0) - 1.0, pos.max(0) + 1.0)
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=HIDDEN, num_message_passing_steps=LAYERS,
        input_sequence_length=S, connectivity_radius=0.6, max_neighbors=20,
        neighbor_slots=8, domain=(tuple(extent[0]), tuple(extent[1])),
        symmetric_gather=os.environ.get("SYM", "1") != "0",
        compute_dtype="bfloat16",
        band_nodes=(
            None if os.environ.get("BAND", "1") == "0"
            else 2 * max(int(np.sqrt(n_particles / 4)), 2) + 16
        ),
        remat=(
            False if os.environ.get("REMAT") == "0"
            else (os.environ.get("REMAT") or True)
        ),
        # PACKMAX: move the packed-gather node ceiling (confounds the
        # N bisection otherwise — it sits at 800k, inside the window)
        packed_gather_max_nodes=int(os.environ.get("PACKMAX", 800_000)),
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = simulator_init(jax.random.key(0), sim_cfg)
    rng = np.random.default_rng(0)
    seq = jnp.asarray(pos[None, :, None, :] + rng.normal(
        scale=0.002, size=(1, n, S, 2)).cumsum(2).astype(np.float32))
    types = jnp.zeros((1, n), jnp.int32)

    t0 = time.time()
    try:
        if mode == "fwd":
            fn = jax.jit(lambda p, s: forward_batched(p, sim_cfg, stats, s, types))
            fn.lower(params, seq).compile()
        elif mode == "loss":
            def loss(p, s):
                acc, tgt, strain = predict_accelerations_batched(
                    p, sim_cfg, stats, s[:, :, -1], jnp.zeros_like(s), s, types
                )
                return jnp.mean((acc - tgt) ** 2) + jnp.mean(strain**2)
            jax.jit(loss).lower(params, seq).compile()
        elif mode == "grad":
            def loss(p, s):
                acc, tgt, strain = predict_accelerations_batched(
                    p, sim_cfg, stats, s[:, :, -1], jnp.zeros_like(s), s, types
                )
                return jnp.mean((acc - tgt) ** 2) + jnp.mean(strain**2)
            compiled = jax.jit(jax.grad(loss)).lower(params, seq).compile()
            try:
                ma = compiled.memory_analysis()
                print(f"memory: temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
                      f"args={ma.argument_size_in_bytes/2**30:.2f} "
                      f"out={ma.output_size_in_bytes/2**30:.2f}")
            except Exception as me:  # noqa: BLE001
                print(f"memory_analysis unavailable: {me}")
        else:  # step variants
            cfg = TrainConfig(batch_size=1, noise_std=0.02,
                              input_sequence_length=S, hidden_dim=HIDDEN,
                              layers=LAYERS)
            tx = optax.adam(1e-3)
            state = {"params": params, "opt_state": tx.init(params),
                     "step": jnp.asarray(0, jnp.int32)}
            batch = {
                "positions": seq,
                "next_position": seq[:, :, -1],
                "next_strain": jnp.zeros((1, n), jnp.float32),
                "particle_type": types,
                "node_mask": jnp.ones((1, n), bool),
            }
            step = make_train_step(sim_cfg, stats, cfg, tx)
            step.lower(state, batch, jax.random.key(1)).compile()
        print(f"COMPILE OK  n={n} mode={mode}  ({time.time()-t0:.0f}s)")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        print(f"COMPILE FAIL  n={n} mode={mode}  ({time.time()-t0:.0f}s)")
        print(f"{type(e).__name__}: {msg[:2000]}")


if __name__ == "__main__":
    main()
