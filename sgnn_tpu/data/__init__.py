from sgnn_tpu.data.builder import DatasetBuilder, build_dataset
from sgnn_tpu.data.loader import (
    load_trajectories,
    load_metadata,
    dataset_info,
    SampleBatcher,
    TrajectoryLoader,
)
from sgnn_tpu.data.synthetic import generate_synthetic_raw_dataset

__all__ = [
    "DatasetBuilder",
    "build_dataset",
    "load_trajectories",
    "load_metadata",
    "dataset_info",
    "SampleBatcher",
    "TrajectoryLoader",
    "generate_synthetic_raw_dataset",
]
