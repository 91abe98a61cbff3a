"""Trace + per-op summary of the multi-scale train step (ms_bench config)."""

import os
import re
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

import bench
from sgnn_tpu.physics.multi_scale_graph import build_static_graph, create_all_edges
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    NormStats,
    multi_scale_simulator_init,
)
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train_multi_scale import make_train_step
from sgnn_tpu.utils.profiling import start_trace, stop_trace, summarize_trace

import scripts.ms_bench as mb  # noqa: F401  (reuse constants)
from scripts.ms_bench import BATCH, N, S, M2M_LAYERS, HIDDEN


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ms_trace"
    sim_cfg, stats, cfg, pos, counts, graph1 = mb.make_setup()
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
    step = make_train_step(sim_cfg, stats, cfg, tx)
    key = jax.random.key(1)
    for _ in range(3):
        state, m = step(state, batch, key)
    float(m["train/loss"])
    start_trace(logdir)
    for _ in range(5):
        state, m = step(state, batch, key)
    float(m["train/loss"])
    stop_trace()

    hlo = step.lower(state, batch, key).compile().as_text()
    src = {}
    for line in hlo.splitlines():
        mm = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = (\S+)", line)
        if not mm:
            continue
        sm = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
        src[mm.group(1)] = (
            mm.group(2)[:46],
            f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else "",
        )
    for r in summarize_trace(logdir, top=50):
        name = r["name"].lstrip("%").split(" ")[0]
        shape, where = src.get(name, ("", ""))
        print(f"{r['ms_per_step']:9.3f} ms  {r['category']:6s}  "
              f"{name[:28]:28s} {shape:46s} {where}")


if __name__ == "__main__":
    main()
