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
    MultiScaleConfig,
    StaticGraph,
    create_all_edges,
    pad_edges,
)


def _build_graphs(
    trajectories, ms_cfg: MultiScaleConfig, edge_pad_multiple: int
) -> List[StaticGraph]:
    """One static graph per trajectory from frame-0 positions, common padding."""
    raw = []
    for pos, _, _ in trajectories:
        # pos: [T, N, dim]; frame-0 positions define the hierarchy
        raw.append(create_all_edges(ms_cfg, pos[0]))

    def pad_size(key):
        m = max(len(r[key].senders) for r in raw)
        return _round_up(max(m, 1), edge_pad_multiple)

    sizes = {k: pad_size(k) for k in ("grid2mesh_edges", "mesh2mesh_edges", "mesh2grid_edges")}
    graphs = []
    for r in raw:
        graphs.append(
            StaticGraph(
                g2m=pad_edges(r["grid2mesh_edges"], sizes["grid2mesh_edges"]),
                m2m=pad_edges(r["mesh2mesh_edges"], sizes["mesh2mesh_edges"]),
                m2g=pad_edges(r["mesh2grid_edges"], sizes["mesh2grid_edges"]),
            )
        )
    return graphs


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
    ):
        super().__init__(
            path,
            input_sequence_length,
            batch_size,
            pad_multiple=pad_multiple,
            seed=seed,
            drop_remainder=drop_remainder,
        )
        self.graphs = _build_graphs(self.trajectories, ms_cfg, edge_pad_multiple)

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
    ):
        super().__init__(path, pad_multiple=pad_multiple)
        self.graphs = _build_graphs(self.trajectories, ms_cfg, edge_pad_multiple)

    def __iter__(self):
        for item, graph in zip(super().__iter__(), self.graphs):
            item["graph"] = graph
            yield item
