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
    """Noise to add to a position sequence. Shape matches the sequence.

    TPU note: the two chained cumsums over the S axis of a [..., S, dim]
    tensor run in a sliver layout (minor dims S*dim << 128 lanes). Both
    integrations are one linear map of the iid draws, so they run as a
    single matmul against a constant [V*dim, S*dim] integration matrix
    W[(u,c),(t,c)] = max(t-u, 0) on draws generated directly in the
    packed 2D [..., V*dim] layout — same distribution (iid normals,
    exact integer weights), different random stream than the cumsum
    form.
    """
    n_steps = position_sequence_shape[-2]
    dim = position_sequence_shape[-1]
    num_velocities = n_steps - 1
    std_each = noise_std_last_step / (num_velocities**0.5)
    lead = position_sequence_shape[:-2]
    z = jax.random.normal(key, lead + (num_velocities * dim,), dtype) * std_each
    # W[(u, c), (t, c')] = (c == c') * (t - u) for t > u: velocity noise at
    # step u contributes (t - u) times to the position at frame t (once
    # per random-walk step it survives in, noise_utils.py:29-37).
    u = jnp.arange(num_velocities)
    t = jnp.arange(n_steps)
    counts = jnp.maximum(t[None, :] - u[:, None], 0).astype(dtype)  # [V, S]
    eye = jnp.eye(dim, dtype=dtype)
    w = jnp.einsum("ut,cd->uctd", counts, eye).reshape(
        num_velocities * dim, n_steps * dim
    )
    pos_noise = jax.lax.dot_general(
        z, w, (((z.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return pos_noise.reshape(lead + (n_steps, dim))
