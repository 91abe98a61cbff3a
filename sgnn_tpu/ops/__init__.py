from sgnn_tpu.ops.neighbors import (
    NeighborList,
    radius_neighbors,
    radius_neighbors_bruteforce,
    radius_neighbors_grid,
    neighbor_list_to_coo,
)
from sgnn_tpu.ops.segment import (
    segment_sum,
    neighbor_sum,
    coo_segment_sum,
)

__all__ = [
    "NeighborList",
    "radius_neighbors",
    "radius_neighbors_bruteforce",
    "radius_neighbors_grid",
    "neighbor_list_to_coo",
    "segment_sum",
    "neighbor_sum",
    "coo_segment_sum",
]
