"""Random-walk training noise (re-derivation of sgnn/noise_utils.py:4-39).

Velocity-space noise accumulated as a random walk, then integrated to
positions with zero noise on the first frame. Per-step std is
``noise_std_last_step / sqrt(num_velocities)`` so the accumulated
velocity noise at the last step has the configured std.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_walk_position_noise(
    key: jax.Array,
    position_sequence_shape: tuple,  # (N, S, dim) — or (B, N, S, dim)
    noise_std_last_step: float,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Noise to add to a position sequence. Shape matches the sequence."""
    n_steps = position_sequence_shape[-2]
    num_velocities = n_steps - 1
    vel_shape = position_sequence_shape[:-2] + (num_velocities,) + position_sequence_shape[-1:]
    std_each = noise_std_last_step / (num_velocities**0.5)
    vel_noise = jax.random.normal(key, vel_shape, dtype) * std_each
    # Random walk in velocity space (noise_utils.py:29).
    vel_noise = jnp.cumsum(vel_noise, axis=-2)
    # Integrate to positions; first frame noiseless (noise_utils.py:35-37).
    pos_noise = jnp.concatenate(
        [
            jnp.zeros(position_sequence_shape[:-2] + (1,) + position_sequence_shape[-1:], dtype),
            jnp.cumsum(vel_noise, axis=-2),
        ],
        axis=-2,
    )
    return pos_noise
