"""Fused edge-block kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgnn_tpu.experimental.edge_block import (
    fused_edge_block,
    fused_edge_block_reference,
)


def make_inputs(rng, r=32, k=8, d=32, h=32):
    degrees = rng.integers(0, k + 1, size=(r, 1)).astype(np.float32)
    slot = np.tile(np.arange(k), r)[:, None]
    mask = (slot < np.repeat(degrees, k, axis=0)).astype(np.float32)
    e = rng.normal(size=(r * k, d)).astype(np.float32) * mask
    return dict(
        e=jnp.asarray(e),
        xj=jnp.asarray(rng.normal(size=(r * k, h)).astype(np.float32)),
        proj_i=jnp.asarray(rng.normal(size=(r, h)).astype(np.float32)),
        degrees=jnp.asarray(degrees),
        we=jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.2),
        be=jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.normal(size=(h, d)).astype(np.float32) * 0.2),
        b2=jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        lns=jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32)),
        lnb=jnp.asarray(0.1 * rng.normal(size=(d,)).astype(np.float32)),
    )


ARG_ORDER = ["e", "xj", "proj_i", "degrees", "we", "be", "w2", "b2", "lns", "lnb"]


@pytest.mark.parametrize("r,k,d", [(32, 8, 32), (512, 4, 16), (64, 20, 64)])
def test_forward_matches_reference(rng, r, k, d):
    inp = make_inputs(rng, r=r, k=k, d=d, h=d)
    args = [inp[key] for key in ARG_ORDER]
    new_e, agg = fused_edge_block(*args, k, True)
    ref_e, ref_agg = fused_edge_block_reference(*args, k)
    np.testing.assert_allclose(np.asarray(new_e), np.asarray(ref_e), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ref_agg), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference(rng):
    r, k, d = 64, 4, 16
    inp = make_inputs(rng, r=r, k=k, d=d, h=d)
    args = [inp[key] for key in ARG_ORDER]

    def loss_kernel(*a):
        new_e, agg = fused_edge_block(*a, k, True)
        return jnp.sum(new_e * 1.3) + jnp.sum(agg**2)

    def loss_ref(*a):
        new_e, agg = fused_edge_block_reference(*a, k)
        return jnp.sum(new_e * 1.3) + jnp.sum(agg**2)

    argnums = tuple(i for i in range(10) if i != 3)  # degrees: no grad
    gk = jax.grad(loss_kernel, argnums=argnums)(*args)
    gr = jax.grad(loss_ref, argnums=argnums)(*args)
    for name, a, b in zip([ARG_ORDER[i] for i in argnums], gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )
