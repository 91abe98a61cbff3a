"""Multi-scale training / validation / rollout driver.

Counterpart of the reference sgnn/multi_scale/multi_scale_train.py
(:79-447) with the same TPU-native step structure as
sgnn_tpu.train.train: one jitted program per step, static-graph batches
vmapped over [B, ...], best-only checkpoints.

Family differences mirrored from the reference:
  * nmlp_layers=2 (multi_scale_train.py:335 vs 1 single-scale),
  * static per-trajectory graphs attached by the loader (set per batch,
    :143) — here batched per-sample, fixing the first-sample collate
    caveat,
  * validation uses per-trajectory rollouts like single-scale; the
    reference's multi-scale evaluator logs per-step RMSE
    (multi_scale_evaluate.py:185-196) — both cumulative and final-step
    values are derivable from our cumulative metric and logged.

CLI:
  python -m sgnn_tpu.train.train_multi_scale --config configs/taylor2d_multi_scale.yaml \
      [--mode train|valid|rollout] [--model_file NAME] [--log True|False]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time
from pathlib import Path
from typing import Optional

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

from sgnn_tpu.data.loader import load_metadata
from sgnn_tpu.data.static_graph_loader import (
    MultiScaleSampleBatcher,
    MultiScaleTrajectoryLoader,
)
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    ms_predict_accelerations_batched,
    ms_rollout,
    multi_scale_simulator_init,
)
from sgnn_tpu.physics.noise import random_walk_position_noise
from sgnn_tpu.physics.simulator import NormStats, make_norm_stats
from sgnn_tpu.train.checkpoint import CheckpointManager
from sgnn_tpu.train.config import TrainConfig, load_config
from sgnn_tpu.train.metrics import MetricLogger
from sgnn_tpu.utils.resource_monitor import ResourceMonitor


def ms_config_from(cfg: TrainConfig, metadata: dict) -> MultiScaleSimulatorConfig:
    return MultiScaleSimulatorConfig(
        dim=cfg.dim,
        latent_dim=cfg.hidden_dim,
        num_message_passing_steps=cfg.layers,
        num_mlp_layers=2,
        input_sequence_length=cfg.input_sequence_length,
        num_particle_types=int(metadata.get("num_particle_types", 1)),
        particle_type_embedding_size=cfg.particle_type_embedding_size,
        num_scales=cfg.num_scales,
        window_size=cfg.window_size,
        radius_multiplier=cfg.radius_multiplier,
        compute_dtype=cfg.compute_dtype,
    )


def lr_schedule(cfg: TrainConfig):
    def sched(step):
        return cfg.lr_init * cfg.lr_decay ** (step / cfg.lr_decay_steps) + 1e-6

    return sched


def make_train_step(sim_cfg: MultiScaleSimulatorConfig, stats: NormStats, cfg: TrainConfig, tx):
    def loss_fn(params, batch, key):
        noise = random_walk_position_noise(key, batch["positions"].shape, cfg.noise_std)

        # Block-diagonal flat batching (ms_forward_batched): one flat COO
        # problem instead of vmapped per-graph scatters/gathers.
        pred_acc, target_acc, pred_strain = ms_predict_accelerations_batched(
            params,
            sim_cfg,
            stats,
            batch["next_position"],
            noise,
            batch["positions"],
            batch["particle_type"],
            batch["graph"],
            batch["node_mask"],
        )
        mask = batch["node_mask"].astype(pred_acc.dtype)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        sq_acc = (pred_acc - target_acc) ** 2
        loss_pos = jnp.sum(sq_acc, axis=-1)
        loss_strain = (pred_strain - batch["next_strain"]) ** 2
        loss = (
            cfg.loss_weight_position * loss_pos
            + cfg.loss_weight_strain * loss_strain
        )
        loss = jnp.sum(loss * mask) / denom
        aux = {
            "train/loss-position": jnp.sum(loss_pos * mask) / denom,
            "train/loss-strain": jnp.sum(loss_strain * mask) / denom,
        }
        return loss, aux

    def step_body(state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, key
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            {"train/loss": loss, **aux},
        )

    return jax.jit(step_body)


def make_train_multi_step(sim_cfg, stats, cfg: TrainConfig, tx, num_steps: int):
    """lax.scan inner loop over time-stacked batches; see
    sgnn_tpu.train.train.make_train_multi_step (same contract — batches
    carry a leading [num_steps] axis, including the per-sample graphs)."""
    single = make_train_step(sim_cfg, stats, cfg, tx)

    @jax.jit
    def multi_step(state, batches, key):
        def scan_body(carry, xs):
            i, batch = xs
            return single(carry, batch, jax.random.fold_in(key, i))

        idx = jnp.arange(num_steps, dtype=jnp.uint32)
        return jax.lax.scan(scan_body, state, (idx, batches))

    return multi_step


def make_jit_rollout(sim_cfg, stats, mode):
    @jax.jit
    def _rollout(params, positions, types, strains, node_mask, graph):
        return ms_rollout(
            params, sim_cfg, stats, positions, types, strains, graph,
            node_mask=node_mask, inference_mode=mode,
        )

    return _rollout


_MS_NODE_AXIS1_KEYS = (
    "initial_positions",
    "initial_strains",
    "predicted_rollout",
    "ground_truth_rollout",
    "predicted_strain",
    "ground_truth_strain",
)


def make_ms_partitioned_host_rollout(mesh, sim_cfg, stats, spec, mode: str):
    """Distributed ms rollout with host-side partitioning per trajectory.

    Same call signature as make_jit_rollout's product (the loader-attached
    graph is ignored — the partition plan builds its own sharded edge
    lists from the trajectory's t=0 positions, pinned to the training
    spec's slab/halo shapes). No replanning is ever needed: the hierarchy
    is static, so the exact host plan stays valid for the whole rollout
    (parallel/ms_partition.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgnn_tpu.parallel.ms_partition import (
        make_ms_partitioned_rollout,
        plan_ms_partition,
    )

    run = make_ms_partitioned_rollout(mesh, sim_cfg, stats, spec, inference_mode=mode)
    node_sh = NamedSharding(mesh, P("graph"))
    rep = NamedSharding(mesh, P())

    def _rollout(params, positions, types, strains, node_mask, graph_unused=None):
        del graph_unused
        params = jax.device_put(params, rep)
        pos = np.asarray(positions)
        ty = np.asarray(types)
        st = np.asarray(strains)
        m = np.asarray(node_mask)
        idx = np.nonzero(m)[0]
        _, order_rel, sgraph = plan_ms_partition(
            sim_cfg.graph_config, pos[idx, 0], spec.num_shards,
            nodes_per_shard=spec.nodes_per_shard, halo=spec.halo,
        )
        order = idx[order_rel]
        nt, k = spec.total_nodes, len(order)
        pos_s = np.zeros((nt, *pos.shape[1:]), pos.dtype)
        pos_s[:k] = pos[order]
        ty_s = np.zeros(nt, ty.dtype)
        ty_s[:k] = ty[order]
        st_s = np.zeros((st.shape[0], nt), st.dtype)
        st_s[:, :k] = st[:, order]
        m_s = np.zeros(nt, bool)
        m_s[:k] = True
        out = run(
            params,
            jax.device_put(pos_s, node_sh),
            jax.device_put(ty_s, node_sh),
            # strains are [T, N]: the node axis is axis 1
            jax.device_put(st_s, NamedSharding(mesh, P(None, "graph"))),
            jax.device_put(m_s, node_sh),
            jax.device_put(jax.tree.map(jnp.asarray, sgraph), node_sh),
        )
        out = {key: np.asarray(v) for key, v in out.items()}
        n_view = pos.shape[0]
        fixed = {}
        for key, v in out.items():
            if key == "particle_types":
                buf = np.zeros((n_view, *v.shape[1:]), v.dtype)
                buf[order] = v[:k]
                fixed[key] = buf
            elif key in _MS_NODE_AXIS1_KEYS:
                buf = np.zeros((v.shape[0], n_view, *v.shape[2:]), v.dtype)
                buf[:, order] = v[:, :k]
                fixed[key] = buf
            else:
                fixed[key] = v
        return fixed

    return _rollout


def evaluate_split(params, loader, jit_rollout):
    """Validation statistics over a trajectory loader.

    Matches the reference's multi-scale validation exactly
    (multi_scale_evaluate.py:102-106): the multi-scale family scores
    rollouts by PER-STEP RMSE — loss_total/position/strain are the
    final step's per-step RMSE, one_step the first step's — unlike the
    single-scale family's cumulative metric (evaluate.py:36-39).
    """
    outputs, losses = [], {"total": [], "position": [], "strain": [], "one_step": []}
    for traj in loader:
        t0 = time.time()
        out = jit_rollout(
            params,
            jnp.asarray(traj["positions"]),
            jnp.asarray(traj["particle_type"]),
            jnp.asarray(traj["strains"]),
            jnp.asarray(traj["node_mask"]),
            jax.tree.map(jnp.asarray, traj["graph"]),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        out["run_time"] = time.time() - t0
        outputs.append(out)
        losses["position"].append(out["rmse_position_per_step"][-1])
        losses["strain"].append(out["rmse_strain_per_step"][-1])
        losses["total"].append(
            out["rmse_position_per_step"][-1] + out["rmse_strain_per_step"][-1]
        )
        losses["one_step"].append(
            out["rmse_position_per_step"][0] + out["rmse_strain_per_step"][0]
        )
    summary = {k: float(np.mean(v)) for k, v in losses.items() if v}
    if outputs:
        # reference parity: the ms evaluator also reports per-rollout
        # runtime mean/std (multi_scale_evaluate.py:125-126)
        times = [o["run_time"] for o in outputs]
        summary["mean_time"] = float(np.mean(times))
        summary["std_time"] = float(np.std(times))
    return outputs, summary


def train(cfg: TrainConfig) -> dict:
    data_dir = Path(cfg.data_path)
    metadata = load_metadata(data_dir)
    sim_cfg = ms_config_from(cfg, metadata)
    stats = make_norm_stats(metadata, cfg.noise_std)

    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    params = multi_scale_simulator_init(init_key, sim_cfg)
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

    ms_graph_cfg = sim_cfg.graph_config
    if cfg.graph_parallel > 1:
        # partition plans replace the loader-attached static graphs
        from sgnn_tpu.data.loader import SampleBatcher

        batcher = SampleBatcher(
            data_dir / "train.npz",
            cfg.input_sequence_length,
            cfg.batch_size,
            pad_multiple=cfg.pad_multiple,
            seed=cfg.seed,
        )
    else:
        batcher = MultiScaleSampleBatcher(
            data_dir / "train.npz",
            cfg.input_sequence_length,
            cfg.batch_size,
            ms_cfg=ms_graph_cfg,
            pad_multiple=cfg.pad_multiple,
            edge_pad_multiple=cfg.edge_pad_multiple,
            seed=cfg.seed,
            dense=cfg.ms_dense,
            dense_row_advantage=(
                4.0 if cfg.compute_dtype == "bfloat16" else 2.0
            ),
            m2m_traversals=cfg.layers,
        )
    valid_loader = MultiScaleTrajectoryLoader(
        data_dir / "valid.npz",
        ms_cfg=ms_graph_cfg,
        pad_multiple=cfg.pad_multiple,
        edge_pad_multiple=cfg.edge_pad_multiple,
        dense=cfg.ms_dense,
        dense_row_advantage=(
            4.0 if cfg.compute_dtype == "bfloat16" else 2.0
        ),
        m2m_traversals=cfg.layers,
    )
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
    if cfg.data_parallel > 1:
        # Same DP wiring as the single-scale trainer (train.py): batch
        # graphs shard over the 'data' mesh axis (StaticGraph pytrees
        # stack their leaves on the batch axis too), params replicate,
        # GSPMD inserts the gradient all-reduce. Mirrors the reference
        # trainer being distributed: multi_scale_train.py:79-287.
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
            batch_put = lambda b: shard_batch(mesh, b)
        print(f"data-parallel over {cfg.data_parallel} devices")
    ms_spec = None
    if cfg.graph_parallel > 1:
        # Multi-scale graph-axis partitioning (parallel/ms_partition.py):
        # slab-shard the full-grid node tensor; the static hierarchy is
        # planned exactly on the host per trajectory (halo sized by the
        # coarsest m2m radius), so no runtime guard is needed.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sgnn_tpu.parallel import make_mesh
        from sgnn_tpu.parallel.ms_partition import (
            make_ms_partitioned_multi_step,
            make_ms_partitioned_train_step,
            ms_dataset_partition,
        )

        if cfg.data_parallel > 1:
            raise ValueError("data_parallel and graph_parallel are mutually exclusive")
        if cfg.batch_size != 1:
            raise ValueError("graph_parallel requires batch_size: 1")
        # ms_dense: True routes the partitioned path through the dense
        # layout (per-shard DenseEdges + transpose plans — the layout
        # that wins ~1.7x at capacity scales); "auto"/False stay COO
        # (the auto cost model is calibrated for the single-device path)
        ms_spec, ms_plans = ms_dataset_partition(
            ms_graph_cfg,
            [pos[0] for pos, _, _ in batcher.trajectories],
            cfg.graph_parallel,
            layout="dense" if cfg.ms_dense is True else "coo",
        )
        gmesh = make_mesh(data=1, graph=cfg.graph_parallel)
        part_kw = dict(
            noise_std=cfg.noise_std,
            loss_weight_position=cfg.loss_weight_position,
            loss_weight_strain=cfg.loss_weight_strain,
        )
        ms_orders = [o for o, _ in ms_plans]
        if inner > 1:
            # scan over stacked batches: graph leaves stack [inner, P, E]
            # on the host and shard axis 1 like the node arrays
            train_step = make_ms_partitioned_multi_step(
                gmesh, sim_cfg, stats, ms_spec, tx, inner, **part_kw
            )
            stacked_shard = NamedSharding(gmesh, P(None, "graph"))
            ms_graphs_feed = [g for _, g in ms_plans]  # host arrays
            batch_put = lambda b: jax.tree.map(
                lambda v: jax.device_put(v, stacked_shard), b
            )
        else:
            train_step = make_ms_partitioned_train_step(
                gmesh, sim_cfg, stats, ms_spec, tx, **part_kw
            )
            node_shard = NamedSharding(gmesh, P("graph"))
            # per-trajectory sharded graphs go to the device once
            ms_graphs_feed = [
                jax.device_put(jax.tree.map(jnp.asarray, g), node_shard)
                for _, g in ms_plans
            ]
            batch_put = lambda b: {
                k: (v if k == "graph" else jax.device_put(v, node_shard))
                for k, v in b.items()
            }
        state = jax.device_put(state, NamedSharding(gmesh, P()))
        print(
            f"ms graph-parallel: {cfg.graph_parallel} shards x "
            f"{ms_spec.nodes_per_shard} nodes (halo {ms_spec.halo})"
        )
    if ms_spec is not None:
        jit_rollout = make_ms_partitioned_host_rollout(
            gmesh, sim_cfg, stats, ms_spec, cfg.inference_mode
        )
    else:
        jit_rollout = make_jit_rollout(sim_cfg, stats, cfg.inference_mode)
    logger = MetricLogger(
        ckpt_dir, use_wandb=cfg.log, project=cfg.project_name, run_name=cfg.run_name
    )
    monitor = ResourceMonitor()
    sched = lr_schedule(cfg)

    print(
        f"multi-scale training: scales={cfg.num_scales} window={cfg.window_size} "
        f"layers={cfg.layers} hidden={cfg.hidden_dim} batch={cfg.batch_size} "
        f"nodes_padded={batcher.num_nodes}"
    )

    from sgnn_tpu.data.prefetch import DevicePrefetcher

    step = int(state["step"])
    t_last = time.time()
    source = batcher.epochs()
    if ms_spec is not None:
        from sgnn_tpu.parallel.ms_partition import ms_partition_sample

        def _partition(gen):
            for b in gen:
                ti = int(b["traj_idx"][0])
                out = ms_partition_sample(b, ms_spec, ms_orders[ti])
                out["graph"] = ms_graphs_feed[ti]
                yield out

        source = _partition(source)
    if inner > 1:
        from sgnn_tpu.train.train import _stack_host_batches

        source = _stack_host_batches(source, inner)
    prefetch = DevicePrefetcher(source, depth=2, put=batch_put)
    interrupted = False
    try:
        for device_batch in prefetch:
            if step >= cfg.ntraining_steps:
                break
            key, step_key = jax.random.split(key)
            state, metrics = train_step(state, device_batch, step_key)
            step += inner
            if inner > 1:
                metrics = jax.tree.map(lambda x: x[-1], metrics)

            if step % cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["lr"] = float(sched(step))
                dt = (time.time() - t_last) / cfg.log_every
                t_last = time.time()
                metrics["train/step_time_s"] = dt
                logger.log(metrics, step)
                print(
                    f"step {step}: loss={metrics['train/loss']:.6f} ({dt*1e3:.0f} ms/step)"
                )

            if step % cfg.nsave_steps == 0 and step > 0:
                print(f"validating at step {step}...")
                monitor.start()
                _, summary = evaluate_split(state["params"], valid_loader, jit_rollout)
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
                        "val/mean_time": summary["mean_time"],
                        "val/std_time": summary["std_time"],
                    },
                    step,
                )
                print(f"  val loss={summary['total']:.6f} (best {lowest_eval_loss:.6f})")
                if summary["total"] < lowest_eval_loss:
                    lowest_eval_loss = summary["total"]
                    path = ckpt.save_best(state, step, lowest_eval_loss)
                    print(f"  new best -> {path.name}")
    except KeyboardInterrupt:
        # reference behavior: always save a final fallback checkpoint on
        # interrupt (multi_scale_train.py:260-276)
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
    data_dir = Path(cfg.data_path)
    metadata = load_metadata(data_dir)
    sim_cfg = ms_config_from(cfg, metadata)
    stats = make_norm_stats(metadata, cfg.noise_std)

    params = multi_scale_simulator_init(jax.random.key(0), sim_cfg)
    if cfg.model_file is None:
        print("error: valid/rollout modes require model_file", file=sys.stderr)
        sys.exit(1)
    tx = optax.adam(learning_rate=lr_schedule(cfg))
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    ckpt = CheckpointManager(Path(cfg.model_path) / cfg.run_name)
    restored, _ = ckpt.restore(state, cfg.model_file)
    params = restored["params"]

    split = "test" if cfg.mode == "rollout" else "valid"
    loader = MultiScaleTrajectoryLoader(
        data_dir / f"{split}.npz",
        ms_cfg=sim_cfg.graph_config,
        pad_multiple=cfg.pad_multiple,
        edge_pad_multiple=cfg.edge_pad_multiple,
        dense=cfg.ms_dense,
        dense_row_advantage=(
            4.0 if cfg.compute_dtype == "bfloat16" else 2.0
        ),
        m2m_traversals=cfg.layers,
    )
    jit_rollout = make_jit_rollout(sim_cfg, stats, cfg.inference_mode)

    monitor = ResourceMonitor()
    monitor.start()
    outputs, summary = evaluate_split(params, loader, jit_rollout)
    run_stats = monitor.stop()

    if cfg.mode == "rollout":
        save_dir = Path(cfg.output_path) / cfg.run_name
        save_dir.mkdir(parents=True, exist_ok=True)
        case_names = metadata.get(f"file_{split}", [])
        for i, out in enumerate(outputs):
            name = (
                case_names[i].replace(".npz", "") if i < len(case_names) else f"rollout_{i}"
            )
            out["metadata"] = metadata
            out["case_name"] = name
            out["inference_mode"] = cfg.inference_mode
            with open(save_dir / f"{name}.pkl", "wb") as f:
                pickle.dump(out, f)
        print(f"saved {len(outputs)} rollout pickles to {save_dir}")

    print("=" * 70)
    print("multi-scale rollout summary")
    print(f"  mean loss: {summary.get('total', float('nan')):.6f}")
    print(f"  total runtime: {run_stats['elapsed_time']:.2f}s")
    print("=" * 70)
    return summary


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser(description="Multi-scale GNN training (TPU)")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--mode", type=str, choices=["train", "valid", "rollout"])
    parser.add_argument("--model_file", type=str)
    parser.add_argument("--log", type=str, choices=["True", "False"])
    args = parser.parse_args(argv)
    cfg = load_config(
        args.config,
        {
            "mode": args.mode,
            "model_file": args.model_file,
            "log": None if args.log is None else args.log == "True",
        },
    )
    print(f"config loaded from {args.config}; mode={cfg.mode}")
    if cfg.mode == "train":
        train(cfg)
    else:
        predict(cfg)


if __name__ == "__main__":
    main()
