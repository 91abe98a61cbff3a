"""Minimal functional module system: params are pytrees, applies are pure.

Design: instead of porting torch ``nn.Module`` state, every layer is an
``init(key, ...) -> params`` plus an ``apply(params, x) -> y`` pair. Params
are plain nested dicts, so they compose freely with ``jax.jit``, ``pjit``
shardings, ``optax``, and orbax checkpoints.

Initialization distributions intentionally match PyTorch defaults so that
(a) training dynamics are comparable to the reference and (b) the
weight-import shim (sgnn_tpu/utils/torch_import.py) round-trips exactly:
  * Linear: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))   (torch.nn.Linear)
  * LayerNorm: scale=1, bias=0, eps=1e-5                (torch.nn.LayerNorm)
  * Embedding: N(0, 1)                                  (torch.nn.Embedding)

MLP topology mirrors the reference builder ``build_mlp`` (xrkong/sgnn
sgnn/single_scale/graph_network.py:7-45): Linear->ReLU stacks with an
identity on the final layer.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# --- Linear ----------------------------------------------------------------


def linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim**0.5)
    return {
        # Stored as [in, out] so apply is x @ w (transpose of torch layout).
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, params["w"], preferred_element_type=x.dtype) + params["b"]


# --- MLP (Linear->ReLU ... ->Linear) --------------------------------------


def mlp_init(
    key: jax.Array,
    in_dim: int,
    hidden_dims: Sequence[int],
    out_dim: int,
    dtype=jnp.float32,
) -> Params:
    """Matches reference build_mlp: hidden layers with ReLU, linear output."""
    sizes = [in_dim, *hidden_dims, out_dim]
    keys = jax.random.split(key, len(sizes) - 1)
    layers: List[Params] = [
        linear_init(k, sizes[i], sizes[i + 1], dtype) for i, k in enumerate(keys)
    ]
    return {"layers": layers}


def mlp_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    layers = params["layers"]
    for layer in layers[:-1]:
        x = jax.nn.relu(linear_apply(layer, x))
    return linear_apply(layers[-1], x)


# --- LayerNorm -------------------------------------------------------------


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _ln_forward(params: Params, x: jnp.ndarray, eps: float):
    # Compute moments in f32 regardless of activation dtype for stability.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    y = xhat * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), mean, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def layer_norm_apply(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with f32 moments and a residual-lean custom VJP.

    Plain AD saves the f32 normalized activations for the backward; on
    bf16 pipelines those f32 [E, D] residuals dominated HBM copies
    (BASELINE.md profile). The custom VJP saves only the input (in its
    own dtype) plus the [., 1] mean/inv vectors and recomputes xhat in
    the backward — the standard LN gradient, same math as AD up to fp
    association.
    """
    y, _, _ = _ln_forward(params, x, eps)
    return y


def _ln_fwd(params: Params, x: jnp.ndarray, eps: float):
    y, mean, inv = _ln_forward(params, x, eps)
    return y, (params["scale"], x, mean, inv)


def _ln_bwd(eps: float, res, g):
    scale, x, mean, inv = res
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * inv
    gf = g.astype(jnp.float32)
    g_xhat = gf * scale.astype(jnp.float32)
    g_x = inv * (
        g_xhat
        - jnp.mean(g_xhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(g_xhat * xhat, axis=-1, keepdims=True)
    )
    reduce_axes = tuple(range(x.ndim - 1))
    g_scale = jnp.sum(gf * xhat, axis=reduce_axes).astype(scale.dtype)
    g_bias = jnp.sum(gf, axis=reduce_axes).astype(scale.dtype)
    return {"scale": g_scale, "bias": g_bias}, g_x.astype(x.dtype)


layer_norm_apply.defvjp(_ln_fwd, _ln_bwd)


# --- MLP + LayerNorm (the reference's encoder/IN building block) -----------


def mlp_ln_init(
    key: jax.Array,
    in_dim: int,
    hidden_dims: Sequence[int],
    out_dim: int,
    dtype=jnp.float32,
) -> Params:
    return {
        "mlp": mlp_init(key, in_dim, hidden_dims, out_dim, dtype),
        "ln": layer_norm_init(out_dim, dtype),
    }


def mlp_ln_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return layer_norm_apply(params["ln"], mlp_apply(params["mlp"], x))


# --- Embedding -------------------------------------------------------------


def embedding_init(
    key: jax.Array, num_embeddings: int, dim: int, dtype=jnp.float32
) -> Params:
    return {"table": jax.random.normal(key, (num_embeddings, dim), dtype)}


def embedding_apply(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["table"][ids]
