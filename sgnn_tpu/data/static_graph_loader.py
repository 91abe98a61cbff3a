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
    dense: bool | str = False,
    num_nodes: int = 0,
    m2m_traversals: int = 6,
    dense_row_advantage: float = 2.0,
) -> List[StaticGraph] | List[DenseStaticGraph]:
    """One static graph per trajectory from frame-0 positions, common padding.

    dense=True emits the TPU-fast dense-slot layout (DenseStaticGraph):
    receiver rows and slot widths pad to the dataset-wide max per edge
    type so every trajectory shares one static shape. dense="auto" picks
    the layout from the dataset's actual degree distributions: dense
    wins unless slot padding inflates traversal-weighted edge rows more
    than ``dense_row_advantage``x over the COO edge count (the measured
    crossover — dense removes the per-edge scatters and, with the static
    transpose plan, the backward ones too, worth about 2x on v5e in f32;
    pass ~4.0 when compute_dtype=bfloat16, which halves the dense path's
    edge traffic while COO stays f32; BASELINE.md r1). m2m edges are
    traversed `m2m_traversals` times per forward (the M2M stack depth),
    g2m/m2g once.
    """
    raw = []
    for pos, _, _ in trajectories:
        # pos: [T, N, dim]; frame-0 positions define the hierarchy
        raw.append(create_all_edges(ms_cfg, pos[0]))

    keys = ("grid2mesh_edges", "mesh2mesh_edges", "mesh2grid_edges")

    def _m2m_views(r):
        """Per-scale COO views of the m2m edges (dense layout keys its
        slot widths per scale, see DenseStaticGraph)."""
        return list(r["mesh2mesh_edges_per_scale"])

    if dense == "auto":
        import numpy as _np

        w = {keys[0]: 1, keys[1]: max(1, m2m_traversals), keys[2]: 1}
        dense_rows, coo_rows = 0, 0
        for k in keys:
            e_max = 1
            for r in raw:
                e_max = max(e_max, len(r[k].senders))
            coo_rows += w[k] * _round_up(e_max, edge_pad_multiple)
            # dense m2m rows count per scale (tight per-scale K)
            views = range(len(_m2m_views(raw[0]))) if k == keys[1] else [None]
            for v in views:
                r_max, k_max = 1, 1
                for r in raw:
                    e = _m2m_views(r)[v] if v is not None else r[k]
                    _, counts = _np.unique(e.receivers, return_counts=True)
                    r_max = max(r_max, len(counts))
                    k_max = max(k_max, int(counts.max()) if len(counts) else 1)
                dense_rows += w[k] * _round_up(r_max, 8) * _round_up(k_max, 4)
        dense = dense_rows <= dense_row_advantage * coo_rows
        print(
            f"ms layout auto: {'dense' if dense else 'coo'} "
            f"(dense rows {dense_rows} vs coo rows {coo_rows})"
        )
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

    def size_for(edge_sets):
        """Dataset-wide dense pad sizes over a list (one COO per traj)."""
        r_max, k_max, sr_max, sk_max = 1, 1, 1, 1
        for e in edge_sets:
            recv, counts = _np.unique(e.receivers, return_counts=True)
            r_max = max(r_max, len(recv))
            k_max = max(k_max, int(counts.max()) if len(counts) else 1)
            snd, scounts = _np.unique(e.senders, return_counts=True)
            sr_max = max(sr_max, len(snd))
            sk_max = max(sk_max, int(scounts.max()) if len(scounts) else 1)
        return (
            _round_up(r_max, 8), _round_up(k_max, 4),
            _round_up(sr_max, 8), _round_up(sk_max, 4),
        )

    sz = {k: size_for([r[k] for r in raw]) for k in (keys[0], keys[2])}
    num_m2m_scales = len(_m2m_views(raw[0]))
    sz_m2m = [
        size_for([_m2m_views(r)[s] for r in raw]) for s in range(num_m2m_scales)
    ]

    def de(e, s):
        return dense_edges(
            e, num_nodes, s[0], s[1], tsp_rows_pad=s[2], tsp_slots=s[3]
        )

    return [
        DenseStaticGraph(
            g2m=de(r[keys[0]], sz[keys[0]]),
            m2m=tuple(
                de(e, s) for e, s in zip(_m2m_views(r), sz_m2m)
            ),
            m2g=de(r[keys[2]], sz[keys[2]]),
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
        dense: bool | str = False,
        m2m_traversals: int = 6,
        dense_row_advantage: float = 2.0,
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
            m2m_traversals=m2m_traversals,
            dense_row_advantage=dense_row_advantage,
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
        dense: bool | str = False,
        m2m_traversals: int = 6,
        dense_row_advantage: float = 2.0,
    ):
        super().__init__(path, pad_multiple=pad_multiple)
        self.graphs = _build_graphs(
            self.trajectories, ms_cfg, edge_pad_multiple,
            dense=dense, num_nodes=self.num_nodes,
            m2m_traversals=m2m_traversals,
            dense_row_advantage=dense_row_advantage,
        )

    def __iter__(self):
        for item, graph in zip(super().__iter__(), self.graphs):
            item["graph"] = graph
            yield item
