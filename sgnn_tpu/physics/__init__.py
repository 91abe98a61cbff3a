from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    simulator_init,
    encoder_preprocess,
    predict_accelerations,
    predict_positions,
    decoder_postprocess,
    inverse_decoder_postprocess,
    time_diff,
    make_norm_stats,
)
from sgnn_tpu.physics.noise import random_walk_position_noise
from sgnn_tpu.physics.rollout import rollout, cumulative_rmse

__all__ = [
    "NormStats",
    "SimulatorConfig",
    "simulator_init",
    "encoder_preprocess",
    "predict_accelerations",
    "predict_positions",
    "decoder_postprocess",
    "inverse_decoder_postprocess",
    "time_diff",
    "make_norm_stats",
    "random_walk_position_noise",
    "rollout",
    "cumulative_rmse",
]
