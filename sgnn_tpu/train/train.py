"""Single-scale training / validation / rollout driver.

TPU-native re-design of the reference trainer
(sgnn/single_scale/train.py:185-556):
  * the entire step — noise sampling, radius-graph build, model forward,
    loss, Adam update — is ONE jitted XLA program over fixed-shape
    [B, N_pad, ...] batches (no per-step host work beyond the feed),
  * batches vmap over graphs instead of concatenating particles,
  * data parallelism shards the batch axis over a jax.sharding Mesh; XLA
    inserts the gradient all-reduce,
  * optax Adam with the reference's exponential schedule
    lr_init * decay^(step/decay_steps) + 1e-6 (train.py:276-278),
  * best-only checkpointing on validation rollout loss with resume
    (train.py:300-391), metric names match the reference wandb schema.

CLI (mirrors train.py:494-556):
  python -m sgnn_tpu.train.train --config configs/taylor2d.yaml \
      [--mode train|valid|rollout] [--model_file NAME] [--log True|False]
"""

from __future__ import annotations

import argparse
import functools
import os
import pickle
import sys
import time
from pathlib import Path
from typing import Optional

import jax

# Honor JAX_PLATFORMS even in environments whose sitecustomize pins the
# platform list after import. This must happen BEFORE importing anything that
# can initialize the backend (orbax does at import), or the override is moot
# and every closed-over constant routes through the remote TPU tunnel.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

from sgnn_tpu.data.loader import SampleBatcher, TrajectoryLoader, load_metadata
from sgnn_tpu.physics.noise import random_walk_position_noise
from sgnn_tpu.physics.rollout import rollout as rollout_fn
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    make_norm_stats,
    predict_accelerations_batched,
    simulator_init,
)
from sgnn_tpu.train.checkpoint import CheckpointManager
from sgnn_tpu.train.config import TrainConfig, load_config
from sgnn_tpu.train.metrics import MetricLogger
from sgnn_tpu.utils.resource_monitor import ResourceMonitor


# --------------------------------------------------------------------------
# wiring
# --------------------------------------------------------------------------


def simulator_config_from(cfg: TrainConfig, metadata: dict) -> SimulatorConfig:
    # Auto-derivations from builder-recorded dataset facts (metadata
    # max_degree / pos_min / pos_max; sgnn_tpu/data/builder.py). Explicit
    # config values always win.
    max_neighbors = 20
    slots = cfg.neighbor_slots
    max_degree = metadata.get("max_degree")
    if slots is None and max_degree is not None:
        # +2 margin: training noise can move a pair across the radius.
        slots = min(max_neighbors, int(max_degree) + 2)
        # Align the slot width for TPU tiling: odd widths measured slower
        # than the next multiple up (7 slots ran 2% slower than 8 at
        # bench scale despite 12.5% fewer edge rows — sublane tiling).
        slots = min(max_neighbors, 8 if slots <= 8 else -(-slots // 4) * 4)
    symmetric = cfg.symmetric_gather
    if symmetric is None:
        # Only profitable with bf16 edge latents (f32 measured slower —
        # the reverse-index build outweighs the scatter savings there).
        symmetric = (
            cfg.compute_dtype == "bfloat16"
            and max_degree is not None
            and slots is not None
            and int(max_degree) + 2 <= slots
        )
    domain = cfg.domain
    if domain is None and "pos_min" in metadata and "pos_max" in metadata:
        lo = np.asarray(metadata["pos_min"], np.float64)
        hi = np.asarray(metadata["pos_max"], np.float64)
        # generous margin for autoregressive-rollout drift
        pad = 0.25 * (hi - lo) + 4 * cfg.connection_radius
        domain = (tuple(lo - pad), tuple(hi + pad))
    return SimulatorConfig(
        dim=cfg.dim,
        latent_dim=cfg.hidden_dim,
        num_message_passing_steps=cfg.layers,
        num_mlp_layers=1,  # reference single-scale uses 1 (train.py:475)
        connectivity_radius=cfg.connection_radius,
        input_sequence_length=cfg.input_sequence_length,
        num_particle_types=int(metadata.get("num_particle_types", 1)),
        particle_type_embedding_size=cfg.particle_type_embedding_size,
        max_neighbors=max_neighbors,
        neighbor_slots=slots,
        symmetric_gather=bool(symmetric),
        compute_dtype=cfg.compute_dtype,
        domain=domain,
        band_nodes=cfg.band_nodes,
        cell_capacity=cfg.cell_capacity,
        remat=cfg.remat,
    )


def lr_schedule(cfg: TrainConfig):
    def sched(step):
        return cfg.lr_init * cfg.lr_decay ** (step / cfg.lr_decay_steps) + 1e-6

    return sched


def make_train_step(sim_cfg: SimulatorConfig, stats: NormStats, cfg: TrainConfig, tx):
    """Build the jitted (state, batch, key) -> (state, metrics) step."""
    return jax.jit(_make_step_body(sim_cfg, stats, cfg, tx))


def _make_step_body(sim_cfg: SimulatorConfig, stats: NormStats, cfg: TrainConfig, tx):
    def loss_fn(params, batch, key):
        noise = random_walk_position_noise(
            key, batch["positions"].shape, cfg.noise_std
        )
        # Block-diagonal flat batching: fast gathers + fused Pallas edge
        # blocks on TPU (models/epd_flat.py), XLA fallback elsewhere.
        banded = sim_cfg.band_nodes is not None
        out = predict_accelerations_batched(
            params,
            sim_cfg,
            stats,
            batch["next_position"],
            noise,
            batch["positions"],
            batch["particle_type"],
            batch["node_mask"],
            return_aux=banded,
        )
        pred_acc, target_acc, pred_strain = out[:3]
        guard_aux = out[3] if banded else {}
        mask = batch["node_mask"].astype(pred_acc.dtype)  # [B, N]
        denom = jnp.maximum(jnp.sum(mask), 1.0)

        sq_acc = (pred_acc - target_acc) ** 2  # [B, N, dim]
        loss_pos = jnp.sum(sq_acc, axis=-1)  # reference sums dims (train.py:261)
        loss_strain = (pred_strain - batch["next_strain"]) ** 2
        loss = (
            cfg.loss_weight_position * loss_pos
            + cfg.loss_weight_strain * loss_strain
        )
        loss = jnp.sum(loss * mask) / denom

        loss_xy = jnp.sum(sq_acc * mask[..., None], axis=(0, 1)) / denom
        aux = {
            "train/loss-position": jnp.sum(loss_pos * mask) / denom,
            "train/loss-strain": jnp.sum(loss_strain * mask) / denom,
            "train/loss-x": loss_xy[0],
            "train/loss-y": loss_xy[1],
        }
        if sim_cfg.dim == 3:
            aux["train/loss-z"] = loss_xy[2]
        if guard_aux:
            # banded-gather contract check (sym_gather.band_violations):
            # nonzero = node ordering decayed past band_nodes, this
            # step's banded gathers were inexact — re-sort the data
            aux["train/band_violations"] = guard_aux["band_violations"]
        return loss, aux

    def step_body(state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, key
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        metrics = {"train/loss": loss, **aux}
        return new_state, metrics

    return step_body


def make_train_multi_step(
    sim_cfg: SimulatorConfig, stats: NormStats, cfg: TrainConfig, tx, num_steps: int
):
    """Build a jitted (state, batches, key) -> (state, metrics) MULTI-step.

    Runs ``num_steps`` optimizer steps inside one XLA program via
    ``lax.scan`` over batches whose leaves carry a leading [num_steps]
    axis (stage them with data/prefetch or jnp.stack). Per-step math is
    identical to make_train_step (pinned by tests); per-step noise keys
    are ``fold_in(key, i)``. Metrics come back with a leading
    [num_steps] axis.

    This is the TPU-idiomatic steady-state loop: one dispatch amortizes
    host/runtime launch latency over many steps — through this
    environment's remote-TPU tunnel that latency is ~1 ms/step, ~25% of
    the whole optimized step (BASELINE.md r1).
    """
    body = _make_step_body(sim_cfg, stats, cfg, tx)

    @jax.jit
    def multi_step(state, batches, key):
        def scan_body(carry, xs):
            i, batch = xs
            new_state, metrics = body(carry, batch, jax.random.fold_in(key, i))
            return new_state, metrics

        idx = jnp.arange(num_steps, dtype=jnp.uint32)
        state, metrics = jax.lax.scan(scan_body, state, (idx, batches))
        return state, metrics

    return multi_step


def evaluate_split(
    params,
    sim_cfg: SimulatorConfig,
    stats: NormStats,
    cfg: TrainConfig,
    loader: TrajectoryLoader,
    jit_rollout,
):
    """Run rollouts over a trajectory loader; return per-case outputs + summary."""
    outputs, losses = [], {"total": [], "position": [], "strain": [], "one_step": []}
    for traj in loader:
        t0 = time.time()
        out = jit_rollout(
            params,
            jnp.asarray(traj["positions"]),
            jnp.asarray(traj["particle_type"]),
            jnp.asarray(traj["strains"]),
            jnp.asarray(traj["node_mask"]),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        out["run_time"] = time.time() - t0
        outputs.append(out)
        losses["position"].append(out["rmse_position"][-1])
        losses["strain"].append(out["rmse_strain"][-1])
        losses["total"].append(out["rmse_position"][-1] + out["rmse_strain"][-1])
        losses["one_step"].append(out["rmse_position"][0] + out["rmse_strain"][0])
    summary = {k: float(np.mean(v)) for k, v in losses.items() if v}
    return outputs, summary


def make_partitioned_host_rollout(mesh, sim_cfg, stats, spec, mode: str):
    """Distributed rollout with host-side partitioning AND auto-replan.

    Same call signature as make_jit_rollout's product, so evaluate_split
    works unchanged. Delegates to edge_partition.make_replanning_rollout:
    nodes are x-sorted into the plan's slabs internally; whenever the
    on-device halo guard fires the partition is re-planned from the
    current geometry and the step re-runs — deformation past the static
    plan costs a re-sort, not silently truncated edges.
    """
    from sgnn_tpu.parallel.edge_partition import make_replanning_rollout

    run = make_replanning_rollout(mesh, sim_cfg, stats, spec, inference_mode=mode)

    def _rollout(params, positions, types, strains, node_mask):
        out = run(params, positions, types, strains, node_mask)
        if out["replans"]:
            print(f"  partition re-planned {out['replans']}x during rollout")
        viol = int(np.sum(out["halo_violations"]))
        if viol:
            print(
                f"  WARNING: {viol} residual halo violations AFTER re-planning "
                "— the plan's slab/halo sizes are too small for this "
                "geometry; rebuild the spec with more slack"
            )
        return out

    return _rollout


def make_jit_rollout(sim_cfg: SimulatorConfig, stats: NormStats, mode: str):
    @functools.partial(jax.jit, static_argnames=())
    def _rollout(params, positions, types, strains, node_mask):
        return rollout_fn(
            params, sim_cfg, stats, positions, types, strains,
            node_mask=node_mask, inference_mode=mode,
        )

    return _rollout


# --------------------------------------------------------------------------
# drivers
# --------------------------------------------------------------------------


def _stack_host_batches(gen, t: int):
    """Group t host batches into one with a leading [t] axis (np.stack).

    Tree-aware: batch values may themselves be pytrees (e.g. the
    multi-scale trainer's per-sample StaticGraph).
    """
    while True:
        group = []
        for _ in range(t):
            try:
                group.append(next(gen))
            except StopIteration:
                return
        yield jax.tree.map(lambda *xs: np.stack(xs), *group)


def train(cfg: TrainConfig) -> dict:
    data_dir = Path(cfg.data_path)
    metadata = load_metadata(data_dir)
    sim_cfg = simulator_config_from(cfg, metadata)
    stats = make_norm_stats(metadata, cfg.noise_std)

    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    params = simulator_init(init_key, sim_cfg)
    tx = optax.adam(learning_rate=lr_schedule(cfg))
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }

    ckpt_dir = Path(cfg.model_path) / cfg.run_name
    ckpt = CheckpointManager(ckpt_dir)
    lowest_eval_loss = float("inf")
    if cfg.model_file is not None:
        state, meta = ckpt.restore(state, cfg.model_file)
        lowest_eval_loss = meta.get("lowest_eval_loss") or float("inf")
        print(f"resumed from {cfg.model_file} at step {int(state['step'])}")

    batcher = SampleBatcher(
        data_dir / "train.npz",
        cfg.input_sequence_length,
        cfg.batch_size,
        pad_multiple=cfg.pad_multiple,
        seed=cfg.seed,
    )
    valid_loader = TrajectoryLoader(data_dir / "valid.npz", pad_multiple=cfg.pad_multiple)
    inner = max(1, int(cfg.inner_steps))
    if inner > 1:
        for name in ("log_every", "nsave_steps", "ntraining_steps"):
            if getattr(cfg, name) % inner:
                raise ValueError(
                    f"{name}={getattr(cfg, name)} must be a multiple of "
                    f"inner_steps={inner}"
                )
        train_step = make_train_multi_step(sim_cfg, stats, cfg, tx, inner)
    else:
        train_step = make_train_step(sim_cfg, stats, cfg, tx)
    batch_put = None
    if cfg.graph_parallel > 1:
        if cfg.data_parallel > 1:
            raise ValueError(
                "data_parallel and graph_parallel are mutually exclusive"
            )
        if cfg.batch_size != 1:
            raise ValueError(
                "graph_parallel trains one partitioned graph per step; "
                "set batch_size: 1"
            )
    if cfg.data_parallel > 1:
        from sgnn_tpu.parallel import make_dp_train_step, make_mesh
        from sgnn_tpu.parallel.data_parallel import (
            make_dp_train_multi_step,
            shard_batch,
            shard_stacked_batch,
        )

        if cfg.batch_size % cfg.data_parallel:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"data_parallel {cfg.data_parallel}"
            )
        mesh = make_mesh(data=cfg.data_parallel, graph=1)
        if inner > 1:
            train_step = make_dp_train_multi_step(train_step, mesh)
            batch_put = lambda b: shard_stacked_batch(mesh, b)
        else:
            train_step = make_dp_train_step(train_step, mesh)
            batch_put = lambda b: shard_batch(mesh, b)  # prefetch straight to shards
        print(f"data-parallel over {cfg.data_parallel} devices")
    spec = None
    if cfg.graph_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sgnn_tpu.parallel import make_mesh
        from sgnn_tpu.parallel.edge_partition import (
            dataset_partition_plan,
            make_partitioned_multi_step,
            make_partitioned_train_step,
        )

        frames = [
            pos[t]
            for pos, _, _ in batcher.trajectories
            for t in (0, pos.shape[0] // 2, pos.shape[0] - 1)
        ]
        # Plan with a noise margin: training adds random-walk noise to the
        # positions INSIDE the step (cumulative std noise_std*sqrt(S-1) at
        # the last frame), so halos sized on clean frames have their
        # margin eaten and the runtime guard fires spuriously. 4 sigma of
        # the last-frame walk on each of the two nodes covers it.
        plan_radius = cfg.connection_radius + 4.0 * cfg.noise_std * float(
            np.sqrt(max(cfg.input_sequence_length - 1, 1))
        )
        spec = dataset_partition_plan(frames, cfg.graph_parallel, plan_radius)
        gmesh = make_mesh(data=1, graph=cfg.graph_parallel)
        part_kw = dict(
            noise_std=cfg.noise_std,
            loss_weight_position=cfg.loss_weight_position,
            loss_weight_strain=cfg.loss_weight_strain,
        )
        if inner > 1:
            # inner_steps composes with graph_parallel: scan the
            # partitioned step over stacked batches (node axis 1 sharded)
            train_step = make_partitioned_multi_step(
                gmesh, sim_cfg, stats, spec, tx, inner, **part_kw
            )
            node_shard = NamedSharding(gmesh, P(None, "graph"))
        else:
            train_step = make_partitioned_train_step(
                gmesh, sim_cfg, stats, spec, tx, **part_kw
            )
            node_shard = NamedSharding(gmesh, P("graph"))
        batch_put = lambda b: {
            k: jax.device_put(v, node_shard) for k, v in b.items()
        }
        # fresh/restored state lives on one device; replicate over the mesh
        state = jax.device_put(state, NamedSharding(gmesh, P()))
        print(
            f"graph-parallel: {cfg.graph_parallel} shards x "
            f"{spec.nodes_per_shard} nodes (halo {spec.halo})"
        )
    if spec is not None:
        jit_rollout = make_partitioned_host_rollout(
            gmesh, sim_cfg, stats, spec, cfg.inference_mode
        )
    else:
        jit_rollout = make_jit_rollout(sim_cfg, stats, cfg.inference_mode)
    logger = MetricLogger(
        ckpt_dir, use_wandb=cfg.log, project=cfg.project_name, run_name=cfg.run_name
    )
    monitor = ResourceMonitor()
    sched = lr_schedule(cfg)

    print(
        f"training: layers={cfg.layers} hidden={cfg.hidden_dim} "
        f"batch={cfg.batch_size} nodes_padded={batcher.num_nodes} "
        f"steps={cfg.ntraining_steps} device={jax.devices()[0].platform}"
    )

    if cfg.debug_graph:
        # One-time connectivity audit (reference debug_graph facility,
        # learned_simulator.py:126-229) on the first sample's graph.
        from sgnn_tpu.physics.simulator import compute_neighbors
        from sgnn_tpu.utils.graph_debug import audit_neighbor_list

        sample = next(iter(batcher))
        pos0 = sample["positions"][0, :, -1]
        m0 = sample["node_mask"][0]
        nl0 = compute_neighbors(sim_cfg, jnp.asarray(pos0), jnp.asarray(m0))
        audit_neighbor_list(pos0, nl0, cfg.connection_radius, node_mask=m0)

    from sgnn_tpu.data.prefetch import DevicePrefetcher

    step = int(state["step"])
    t_last = time.time()
    source = batcher.epochs()
    if spec is not None:
        # partition BEFORE stacking: partition_sample consumes [1, N, ...]
        # batches and emits flat [N, ...] samples; stacking then yields
        # [inner, N, ...] leaves (node axis 1) for the scanned step
        from sgnn_tpu.parallel.edge_partition import partition_sample

        source = (partition_sample(b, spec) for b in source)
    if inner > 1:
        source = _stack_host_batches(source, inner)
    prefetch = DevicePrefetcher(source, depth=2, put=batch_put)
    from sgnn_tpu.parallel.edge_partition import RejectionTracker

    # fires after 20 consecutive all-rejected LOG points (see loop below)
    rejection_tracker = RejectionTracker(limit=20)
    interrupted = False
    try:
        for device_batch in prefetch:
            if step >= cfg.ntraining_steps:
                break
            key, step_key = jax.random.split(key)
            state, metrics = train_step(state, device_batch, step_key)
            step += inner
            if inner > 1:
                # per-step metrics come back stacked [inner]; report the last
                metrics = jax.tree.map(lambda x: x[-1], metrics)

            if step % cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["lr"] = float(sched(step))
                metrics["train/vram_mb"] = monitor.get_current_memory()
                dt = (time.time() - t_last) / cfg.log_every
                t_last = time.time()
                metrics["train/step_time_s"] = dt
                logger.log(metrics, step)
                print(
                    f"step {step}: loss={metrics['train/loss']:.6f} "
                    f"pos={metrics['train/loss-position']:.6f} "
                    f"strain={metrics['train/loss-strain']:.6f} "
                    f"({dt*1e3:.0f} ms/step)"
                )
                if metrics.get("train/halo_violations", 0) > 0:
                    print(
                        "  NOTE: halo-contract violations this step — the "
                        "noisy sample geometry outgrew the static partition "
                        "plan; the update was REJECTED in-step (gradients "
                        "from the truncated edge set never reached the "
                        "optimizer — train/halo_rejected) and the SAMPLE "
                        "SKIPPED (the loop advances to the next prefetched "
                        "batch; step/LR schedule advance too). Frequent "
                        "rejections mean the plan's noise margin is too "
                        "thin: rebuild with a larger halo_slack."
                    )
                # Abort loudly if the geometry has permanently outgrown
                # the plan (every step rejected -> params frozen while
                # the schedule burns). Sampled at log granularity to
                # avoid per-step host syncs through the TPU tunnel; a
                # permanently outgrown plan rejects EVERY step, so every
                # log point sees rejected=1 and this fires after
                # limit*log_every steps.
                rejection_tracker.update(
                    metrics.get("train/halo_rejected", 0) > 0
                )
                if metrics.get("train/band_violations", 0) > 0:
                    print(
                        "  WARNING: banded-gather contract violations this "
                        "step — node ordering decayed past band_nodes; this "
                        "step's gathers were inexact (sym_gather.band_violations)"
                    )

            if step % cfg.nsave_steps == 0 and step > 0:
                print(f"validating at step {step}...")
                monitor.start()
                _, summary = evaluate_split(
                    state["params"], sim_cfg, stats, cfg, valid_loader, jit_rollout
                )
                val_stats = monitor.stop()
                if not summary:
                    print("  WARNING: validation split is empty — skipping")
                    continue
                logger.log(
                    {
                        "val/loss": summary["total"],
                        "val/loss-position": summary["position"],
                        "val/loss-strain": summary["strain"],
                        "val/rmse-oneStep": summary["one_step"],
                        "val/runtime": val_stats["elapsed_time"],
                        "val/vram_mb": val_stats["max_memory_mb"],
                    },
                    step,
                )
                print(
                    f"  val loss={summary['total']:.6f} "
                    f"(best {lowest_eval_loss:.6f}), {val_stats['elapsed_time']:.1f}s"
                )
                if summary["total"] < lowest_eval_loss:
                    lowest_eval_loss = summary["total"]
                    path = ckpt.save_best(state, step, lowest_eval_loss)
                    print(f"  new best -> {path.name}")
    except KeyboardInterrupt:
        # reference behavior: always save a final fallback checkpoint on
        # interrupt (train.py:401-417)
        interrupted = True
        print("training interrupted")
    finally:
        prefetch.close()

    if interrupted or lowest_eval_loss == float("inf"):
        path = ckpt.save_final(state, step)
        print(f"saved fallback {path.name}")
    logger.close()
    return {"step": step, "lowest_eval_loss": lowest_eval_loss}


def predict(cfg: TrainConfig) -> dict:
    """Rollout over valid (mode=valid) or test (mode=rollout) trajectories."""
    data_dir = Path(cfg.data_path)
    metadata = load_metadata(data_dir)
    sim_cfg = simulator_config_from(cfg, metadata)
    stats = make_norm_stats(metadata, cfg.noise_std)

    params = simulator_init(jax.random.key(0), sim_cfg)
    if cfg.model_file is None:
        print("error: valid/rollout modes require model_file", file=sys.stderr)
        sys.exit(1)
    ckpt = CheckpointManager(Path(cfg.model_path) / cfg.run_name)
    # Checkpoints store the full train state; rebuild its topology to restore.
    tx = optax.adam(learning_rate=lr_schedule(cfg))
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    restored, _ = ckpt.restore(state, cfg.model_file)
    params = restored["params"]

    split = "test" if cfg.mode == "rollout" else "valid"
    loader = TrajectoryLoader(data_dir / f"{split}.npz", pad_multiple=cfg.pad_multiple)
    if cfg.graph_parallel > 1:
        from sgnn_tpu.parallel import make_mesh
        from sgnn_tpu.parallel.edge_partition import dataset_partition_plan

        frames = [
            pos[t]
            for pos, _, _ in loader.trajectories
            for t in (0, pos.shape[0] // 2, pos.shape[0] - 1)
        ]
        spec = dataset_partition_plan(
            frames, cfg.graph_parallel, cfg.connection_radius
        )
        gmesh = make_mesh(data=1, graph=cfg.graph_parallel)
        jit_rollout = make_partitioned_host_rollout(
            gmesh, sim_cfg, stats, spec, cfg.inference_mode
        )
        print(
            f"graph-parallel rollout: {cfg.graph_parallel} shards x "
            f"{spec.nodes_per_shard} nodes (halo {spec.halo})"
        )
    else:
        jit_rollout = make_jit_rollout(sim_cfg, stats, cfg.inference_mode)

    monitor = ResourceMonitor()
    monitor.start()
    outputs, summary = evaluate_split(params, sim_cfg, stats, cfg, loader, jit_rollout)
    run_stats = monitor.stop()

    if cfg.mode == "rollout":
        save_dir = Path(cfg.output_path) / cfg.run_name
        save_dir.mkdir(parents=True, exist_ok=True)
        case_names = metadata.get(f"file_{split}", [])
        for i, out in enumerate(outputs):
            name = (
                case_names[i].replace(".npz", "")
                if i < len(case_names)
                else f"rollout_{i}"
            )
            out["metadata"] = metadata
            out["case_name"] = name
            out["inference_mode"] = cfg.inference_mode
            with open(save_dir / f"{name}.pkl", "wb") as f:
                pickle.dump(out, f)
        print(f"saved {len(outputs)} rollout pickles to {save_dir}")

    print("=" * 70)
    print("rollout summary")
    print(f"  mean loss: {summary.get('total', float('nan')):.6f}")
    print(f"  total runtime: {run_stats['elapsed_time']:.2f}s")
    if outputs:
        print(f"  avg per rollout: {run_stats['elapsed_time'] / len(outputs):.2f}s")
    print(f"  peak device mem: {run_stats['max_memory_mb']:.1f}MB")
    print("=" * 70)
    return summary


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser(description="Single-scale GNN training (TPU)")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--mode", type=str, choices=["train", "valid", "rollout"])
    parser.add_argument("--model_file", type=str)
    parser.add_argument("--log", type=str, choices=["True", "False"])
    args = parser.parse_args(argv)

    overrides = {
        "mode": args.mode,
        "model_file": args.model_file,
        "log": None if args.log is None else args.log == "True",
    }
    cfg = load_config(args.config, overrides)
    print(f"config loaded from {args.config}; mode={cfg.mode}")

    if cfg.mode == "train":
        train(cfg)
    else:
        predict(cfg)


if __name__ == "__main__":
    main()
