"""Per-layer activation parity of the JAX EPD stack vs the torch oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sgnn_tpu.models import (
    EPDConfig,
    encode_process_decode_apply,
    encode_process_decode_init,
    interaction_network_apply,
)
from sgnn_tpu.nn import mlp_ln_apply
from sgnn_tpu.ops import radius_neighbors_bruteforce, neighbor_list_to_coo

from torch_oracle import (
    OracleEPD,
    OracleInteractionNetwork,
    copy_epd_to_jax,
    copy_mlp_ln_to_jax,
)


def make_graph(rng, n=40, dim=2, r=0.5, k=16):
    pos = rng.uniform(-1, 1, size=(n, dim)).astype(np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), r, max_neighbors=k)
    s, recv, m = (np.asarray(a) for a in neighbor_list_to_coo(nl))
    return pos, nl, s[m], recv[m]


def test_interaction_network_parity(rng):
    d, n, k = 32, 40, 16
    torch.manual_seed(0)
    blk = OracleInteractionNetwork(d, d, nlayers=1).eval()
    pos, nl, senders, receivers = make_graph(rng, n=n, k=k)

    x = rng.normal(size=(n, d)).astype(np.float32)
    # dense edge latents -> also flatten into COO order for the oracle
    e_dense = rng.normal(size=(n, k, d)).astype(np.float32)
    e_dense *= np.asarray(nl.mask)[..., None]
    mask_flat = np.asarray(nl.mask).reshape(-1)
    e_coo = e_dense.reshape(-1, d)[mask_flat]

    with torch.no_grad():
        tx, te = blk(
            torch.tensor(x),
            torch.tensor(senders, dtype=torch.long),
            torch.tensor(receivers, dtype=torch.long),
            torch.tensor(e_coo),
        )

    params = {
        "edge": copy_mlp_ln_to_jax(blk.edge_fn),
        "node": copy_mlp_ln_to_jax(blk.node_fn),
    }
    jx, je = interaction_network_apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(e_dense), nl
    )

    np.testing.assert_allclose(np.asarray(jx), tx.numpy(), rtol=2e-5, atol=2e-5)
    je_coo = np.asarray(je).reshape(-1, d)[mask_flat]
    np.testing.assert_allclose(je_coo, te.numpy(), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("steps,nlayers", [(2, 1), (3, 2)])
def test_epd_full_parity(rng, steps, nlayers):
    node_in, edge_in, node_out, d = 21, 3, 3, 32
    torch.manual_seed(1)
    oracle = OracleEPD(node_in, edge_in, node_out, d, steps, nlayers).eval()
    pos, nl, senders, receivers = make_graph(rng)
    n, k = nl.senders.shape

    nf = rng.normal(size=(n, node_in)).astype(np.float32)
    ef_dense = rng.normal(size=(n, k, edge_in)).astype(np.float32)
    mask_flat = np.asarray(nl.mask).reshape(-1)
    ef_coo = ef_dense.reshape(-1, edge_in)[mask_flat]

    with torch.no_grad():
        t_out = oracle(
            torch.tensor(nf),
            torch.tensor(ef_coo),
            torch.tensor(senders, dtype=torch.long),
            torch.tensor(receivers, dtype=torch.long),
        )

    params = jax.tree.map(jnp.asarray, copy_epd_to_jax(oracle))
    j_out = encode_process_decode_apply(params, jnp.asarray(nf), jnp.asarray(ef_dense), nl)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=5e-5, atol=5e-5)


def test_epd_init_and_grad_shapes():
    cfg = EPDConfig(node_in=21, edge_in=3, node_out=3, latent_dim=32,
                    num_message_passing_steps=2, num_mlp_layers=1)
    params = encode_process_decode_init(jax.random.key(0), cfg)
    n, k = 20, 8
    key = jax.random.key(1)
    pos = jax.random.uniform(key, (n, 2), minval=-1, maxval=1)
    nl = radius_neighbors_bruteforce(pos, 0.7, max_neighbors=k)
    nf = jax.random.normal(key, (n, cfg.node_in))
    ef = jax.random.normal(key, (n, k, cfg.edge_in))

    def loss_fn(p):
        out = encode_process_decode_apply(p, nf, ef, nl)
        return jnp.mean(out**2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # grads match param shapes
    chex_shapes = jax.tree.map(lambda p, g: p.shape == g.shape, params, grads)
    assert all(jax.tree.leaves(chex_shapes))


def test_padded_nodes_do_not_leak(rng):
    """Real nodes' outputs are invariant to padded-node garbage."""
    cfg = EPDConfig(node_in=5, edge_in=3, node_out=2, latent_dim=16,
                    num_message_passing_steps=2)
    params = encode_process_decode_init(jax.random.key(0), cfg)
    n_real, n_pad, k = 24, 8, 8
    pos_real = rng.uniform(-1, 1, size=(n_real, 2)).astype(np.float32)

    def run(pad_value):
        pos = np.concatenate([pos_real, np.full((n_pad, 2), pad_value, np.float32)])
        mask = np.zeros(n_real + n_pad, bool)
        mask[:n_real] = True
        nl = radius_neighbors_bruteforce(
            jnp.asarray(pos), 0.6, max_neighbors=k, node_mask=jnp.asarray(mask)
        )
        nf = np.concatenate(
            [np.ones((n_real, 5), np.float32), np.full((n_pad, 5), pad_value, np.float32)]
        )
        ef = np.zeros((n_real + n_pad, k, 3), np.float32)
        return np.asarray(
            encode_process_decode_apply(params, jnp.asarray(nf), jnp.asarray(ef), nl)
        )[:n_real]

    np.testing.assert_allclose(run(0.123), run(7.7), rtol=1e-6, atol=1e-6)
