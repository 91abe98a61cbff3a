"""Functional nn layers vs torch equivalents (parity + init distribution)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sgnn_tpu.nn import (
    embedding_apply,
    layer_norm_apply,
    linear_apply,
    mlp_apply,
    mlp_init,
)
from torch_oracle import build_mlp, copy_mlp_to_jax


def test_linear_parity(rng):
    torch.manual_seed(0)
    lin = nn.Linear(7, 5)
    x = rng.normal(size=(13, 7)).astype(np.float32)
    with torch.no_grad():
        t = lin(torch.tensor(x)).numpy()
    p = {"w": jnp.asarray(lin.weight.detach().numpy().T), "b": jnp.asarray(lin.bias.detach().numpy())}
    np.testing.assert_allclose(np.asarray(linear_apply(p, jnp.asarray(x))), t, rtol=1e-5, atol=1e-6)


def test_mlp_parity(rng):
    torch.manual_seed(0)
    seq = build_mlp(6, 16, 4, nlayers=2)
    x = rng.normal(size=(9, 6)).astype(np.float32)
    with torch.no_grad():
        t = seq(torch.tensor(x)).numpy()
    p = jax.tree.map(jnp.asarray, copy_mlp_to_jax(seq))
    np.testing.assert_allclose(np.asarray(mlp_apply(p, jnp.asarray(x))), t, rtol=1e-5, atol=1e-6)


def test_layernorm_parity(rng):
    torch.manual_seed(0)
    ln = nn.LayerNorm(12)
    with torch.no_grad():
        ln.weight.mul_(1.7).add_(0.1)
        ln.bias.add_(0.3)
    x = rng.normal(size=(5, 12)).astype(np.float32)
    with torch.no_grad():
        t = ln(torch.tensor(x)).numpy()
    p = {"scale": jnp.asarray(ln.weight.detach().numpy()), "bias": jnp.asarray(ln.bias.detach().numpy())}
    np.testing.assert_allclose(np.asarray(layer_norm_apply(p, jnp.asarray(x))), t, rtol=1e-5, atol=1e-5)


def test_mlp_init_distribution():
    # torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b.
    p = mlp_init(jax.random.key(0), 64, [128], 32)
    w0 = np.asarray(p["layers"][0]["w"])
    bound = 1 / np.sqrt(64)
    assert w0.min() >= -bound and w0.max() <= bound
    assert abs(w0.std() - bound / np.sqrt(3)) < 0.01  # uniform std = bound/sqrt(3)
    w1 = np.asarray(p["layers"][1]["w"])
    assert abs(w1.std() - (1 / np.sqrt(128)) / np.sqrt(3)) < 0.005


def test_embedding(rng):
    from sgnn_tpu.nn import embedding_init

    p = embedding_init(jax.random.key(0), 9, 16)
    ids = jnp.asarray([0, 3, 8, 3])
    out = embedding_apply(p, ids)
    assert out.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out[3]))


def test_layer_norm_custom_vjp_grads_match_autodiff(rng):
    """The residual-lean LN VJP == plain-AD gradients (both dtypes)."""
    import jax
    import jax.numpy as jnp
    from sgnn_tpu.nn.core import layer_norm_apply, layer_norm_init

    def plain_ln(params, x, eps=1e-5):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)

    params = layer_norm_init(16)
    params = {
        "scale": params["scale"] + jnp.asarray(rng.normal(size=16, scale=0.1), jnp.float32),
        "bias": params["bias"] + jnp.asarray(rng.normal(size=16, scale=0.1), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(40, 16)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(40, 16)).astype(np.float32))

    def loss(fn, p, xx):
        return jnp.sum(fn(p, xx) * cot)

    g_ref = jax.grad(lambda p, xx: loss(plain_ln, p, xx), argnums=(0, 1))(params, x)
    g_new = jax.grad(lambda p, xx: loss(layer_norm_apply, p, xx), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # bf16 activations: compare against AD of the same bf16 function
    xb = x.astype(jnp.bfloat16)
    g_ref16 = jax.grad(lambda p: loss(plain_ln, p, xb))(params)
    g_new16 = jax.grad(lambda p: loss(layer_norm_apply, p, xb))(params)
    for a, b in zip(jax.tree.leaves(g_new16), jax.tree.leaves(g_ref16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)
