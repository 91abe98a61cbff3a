"""YAML config + CLI overrides.

Key names intentionally match the reference's config.yaml
(sgnn/single_scale/config.yaml) so configs translate 1:1; TPU-specific
additions (padding, sharding, dtype) live under the same flat namespace
with defaults that reproduce reference behavior.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Tuple

import yaml


@dataclasses.dataclass
class TrainConfig:
    # Mode & paths (config.yaml:5-13)
    mode: str = "train"  # train | valid | rollout
    data_path: str = "datasets/taylor_impact_2d/data_processed/"
    model_path: str = "models/single_scale/"
    output_path: str = "rollouts/single_scale/"

    # Model (config.yaml:15-21)
    layers: int = 5
    hidden_dim: int = 64
    dim: int = 2
    particle_type_embedding_size: int = 9
    input_sequence_length: int = 11
    connection_radius: float = 0.6

    # Training (config.yaml:23-27)
    batch_size: int = 32
    noise_std: float = 0.02
    ntraining_steps: int = 100_000
    nsave_steps: int = 2000

    # Loss weights (config.yaml:29-31)
    loss_weight_position: float = 1.0
    loss_weight_strain: float = 1.0

    # LR schedule (config.yaml:33-36)
    lr_init: float = 1e-3
    lr_decay: float = 0.1
    lr_decay_steps: int = 30_000

    # Logging (config.yaml:38-41)
    log: bool = False
    project_name: str = "Taylor_impact_2d"
    run_name: str = "single_scale_default"

    # Model loading (config.yaml:43-46)
    model_file: Optional[str] = None
    train_state_file: Optional[str] = None

    # Inference (config.yaml:48-51)
    inference_mode: str = "autoregressive"
    debug_graph: bool = False

    # Multi-scale family (multi_scale_config.yaml:15-18)
    num_scales: int = 2
    window_size: int = 2
    radius_multiplier: float = 2.0
    edge_pad_multiple: int = 1024
    # Multi-scale edge layout: True = dense per-receiver slots (scatter-
    # free aggregation + static-transpose-plan backward, the fast path
    # when degrees are near-uniform: 20.3 vs 34.7 ms/step at reference
    # scale on v5e), False = flat padded COO (wins when degree skew
    # inflates slot padding, e.g. m2g max 24 vs mean ~2 on some data),
    # "auto" (default) = pick per dataset from actual degree stats
    # (static_graph_loader._build_graphs cost model).
    ms_dense: bool | str = "auto"

    # --- TPU-native additions ------------------------------------------------
    pad_multiple: int = 128  # node-count padding granularity
    # Static spatial domain for the cell-list neighbor search; None -> O(N^2).
    domain_min: Optional[List[float]] = None
    domain_max: Optional[List[float]] = None
    # Max occupants per search grid cell (cell side = radius); must cover
    # the densest cell or neighbors silently drop (SimulatorConfig doc).
    cell_capacity: int = 8
    # Device mesh: number of data-parallel shards (1 = single chip).
    data_parallel: int = 1
    # Graph/edge partitioning (parallel/edge_partition.py): shard ONE
    # graph's nodes/edges over this many chips with per-layer halo
    # exchange — the scaling axis for graphs too large/slow for one chip
    # (BASELINE.md size sweep). Requires batch_size=1 (one partitioned
    # graph per step); mutually exclusive with data_parallel>1 for now.
    graph_parallel: int = 1
    # Physical neighbor-list slots. None -> auto: the builder-recorded
    # dataset max degree + 2 (capped at max_neighbors), falling back to
    # max_neighbors for datasets without the record. Exact semantics with
    # smaller edge tensors as long as true degree <= slots.
    neighbor_slots: Optional[int] = None
    # Scatter-free sender-gather VJP (ops/sym_gather.py). None -> auto:
    # enabled when the recorded max degree (+2 noise margin) fits the
    # slot count, i.e. the neighbor cap never binds and the radius graph
    # is symmetric. Only profitable together with bf16 (BASELINE.md).
    symmetric_gather: Optional[bool] = None
    compute_dtype: str = "float32"
    # Banded-gather index-locality bound (SimulatorConfig.band_nodes):
    # set when the loader/feed keeps nodes spatially sorted; guarded by
    # the train/band_violations metric. None = off.
    band_nodes: Optional[int] = None
    # Rematerialize processor layers in the backward
    # (SimulatorConfig.remat): ~6% slower per step but required to fit
    # 500k+-node graphs in HBM. Off by default; "xj_msg" also saves the
    # edge messages (less bwd recompute, +629 MB/layer at 614k); "full"
    # saves only layer inputs (minimum memory, for ~800k+ nodes).
    remat: object = False  # false | true | "xj" | "xj_msg" | "full"
    # Optimizer steps per device dispatch (lax.scan inner loop,
    # train.make_train_multi_step). >1 amortizes host launch latency;
    # log_every/nsave_steps/ntraining_steps must be multiples of it.
    inner_steps: int = 1
    seed: int = 0
    log_every: int = 10

    @property
    def domain(self) -> Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]]:
        if self.domain_min is None or self.domain_max is None:
            return None
        return (tuple(self.domain_min), tuple(self.domain_max))


def load_config(path: str | Path, overrides: Optional[dict] = None) -> TrainConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"Unknown config keys in {path}: {sorted(unknown)}")
    cfg = TrainConfig(**raw)
    for k, v in (overrides or {}).items():
        if v is not None:
            setattr(cfg, k, v)
    return cfg
