"""Multi-scale data loading: per-trajectory static graphs attached to batches.

Reference counterpart: sgnn/multi_scale/static_graph_data_loader.py:27-364,
which precomputes one multi-scale graph per trajectory from its frame-0
positions (:101-118). Known reference caveat fixed here (SURVEY.md §7.4):
its collate uses the FIRST sample's graph for the whole batch (:226-229),
which is only correct for single-trajectory datasets — we batch each
sample's own graph (StaticGraph pytrees stack along a leading batch axis
and vmap with the model).

Edge counts vary per trajectory; all graphs pad to the dataset-wide max
per edge type (rounded up) so XLA sees one static shape.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np

from sgnn_tpu.data.loader import SampleBatcher, TrajectoryLoader, _round_up
from sgnn_tpu.physics.multi_scale_graph import (
    CooEdges,
    DenseStaticGraph,
    MultiScaleConfig,
    StaticGraph,
    create_all_edges,
    dense_edges,
    pad_edges,
)


def _build_graphs(
    trajectories,
    ms_cfg: MultiScaleConfig,
    edge_pad_multiple: int,
    *,
    dense: bool = False,
    num_nodes: int = 0,
) -> List[StaticGraph] | List[DenseStaticGraph]:
    """One static graph per trajectory from frame-0 positions, common padding.

    dense=True emits the TPU-fast dense-slot layout (DenseStaticGraph):
    receiver rows and slot widths pad to the dataset-wide max per edge
    type so every trajectory shares one static shape.
    """
    raw = []
    for pos, _, _ in trajectories:
        # pos: [T, N, dim]; frame-0 positions define the hierarchy
        raw.append(create_all_edges(ms_cfg, pos[0]))

    keys = ("grid2mesh_edges", "mesh2mesh_edges", "mesh2grid_edges")
    if not dense:
        sizes = {
            k: _round_up(max(max(len(r[k].senders) for r in raw), 1), edge_pad_multiple)
            for k in keys
        }
        return [
            StaticGraph(
                g2m=pad_edges(r["grid2mesh_edges"], sizes["grid2mesh_edges"]),
                m2m=pad_edges(r["mesh2mesh_edges"], sizes["mesh2mesh_edges"]),
                m2g=pad_edges(r["mesh2grid_edges"], sizes["mesh2grid_edges"]),
            )
            for r in raw
        ]

    import numpy as _np

    rows, slots = {}, {}
    for k in keys:
        r_max, k_max = 1, 1
        for r in raw:
            recv, counts = _np.unique(r[k].receivers, return_counts=True)
            r_max = max(r_max, len(recv))
            k_max = max(k_max, int(counts.max()) if len(counts) else 1)
        rows[k] = _round_up(r_max, 8)
        slots[k] = _round_up(k_max, 4)
    return [
        DenseStaticGraph(
            g2m=dense_edges(r["grid2mesh_edges"], num_nodes, rows[keys[0]], slots[keys[0]]),
            m2m=dense_edges(r["mesh2mesh_edges"], num_nodes, rows[keys[1]], slots[keys[1]]),
            m2g=dense_edges(r["mesh2grid_edges"], num_nodes, rows[keys[2]], slots[keys[2]]),
        )
        for r in raw
    ]


def _stack_graphs(graphs: List[StaticGraph]) -> StaticGraph:
    """Stack a list of StaticGraphs along a new leading batch axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *graphs)


class MultiScaleSampleBatcher(SampleBatcher):
    """SampleBatcher that attaches each sample's trajectory static graph."""

    def __init__(
        self,
        path: str | Path,
        input_sequence_length: int,
        batch_size: int,
        *,
        ms_cfg: MultiScaleConfig,
        pad_multiple: int = 128,
        edge_pad_multiple: int = 1024,
        seed: int = 0,
        drop_remainder: bool = True,
        dense: bool = False,
    ):
        super().__init__(
            path,
            input_sequence_length,
            batch_size,
            pad_multiple=pad_multiple,
            seed=seed,
            drop_remainder=drop_remainder,
        )
        self.graphs = _build_graphs(
            self.trajectories, ms_cfg, edge_pad_multiple,
            dense=dense, num_nodes=self.num_nodes,
        )

    def _gather(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        batch = super()._gather(idxs)
        batch["graph"] = _stack_graphs(
            [self.graphs[self.samples[i][0]] for i in idxs]
        )
        return batch


class MultiScaleTrajectoryLoader(TrajectoryLoader):
    """TrajectoryLoader that attaches each trajectory's static graph."""

    def __init__(
        self,
        path: str | Path,
        *,
        ms_cfg: MultiScaleConfig,
        pad_multiple: int = 128,
        edge_pad_multiple: int = 1024,
        dense: bool = False,
    ):
        super().__init__(path, pad_multiple=pad_multiple)
        self.graphs = _build_graphs(
            self.trajectories, ms_cfg, edge_pad_multiple,
            dense=dense, num_nodes=self.num_nodes,
        )

    def __iter__(self):
        for item, graph in zip(super().__iter__(), self.graphs):
            item["graph"] = graph
            yield item
