"""sgnn-tpu: a TPU-native graph-network simulator framework.

A from-scratch JAX/XLA/Pallas re-design of the sGNN learned physics
simulator family (encode-process-decode GNNs over particle radius graphs,
reference: xrkong/sgnn). Nothing here is a port: graphs are static-shape
padded neighbor lists, models are pure-functional pytrees, hot ops are
Pallas kernels, and scaling rides `jax.sharding` meshes.

Layer map (mirrors reference capabilities, TPU-first architecture):
  ops/       radius-neighbor search, segment/neighbor aggregation, Pallas kernels
  nn/        functional module system (MLP, LayerNorm, Embedding)
  models/    EncodeProcessDecode, MultiScaleGNN
  physics/   simulators (feature engineering, Euler integration), noise, rollout
  data/      dataset build pipeline, npz loaders, synthetic data
  train/     training drivers, config, checkpointing, metrics
  parallel/  device-mesh sharding: data-parallel + edge-partitioned message passing
  utils/     resource monitoring, profiling helpers
  viz/       rollout rendering
"""

__version__ = "0.1.0"
