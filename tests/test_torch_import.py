"""Weight-import shim: reference state_dict layout -> params, with
end-to-end forward parity through the imported weights."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sgnn_tpu.models import encode_process_decode_apply
from sgnn_tpu.ops import radius_neighbors_bruteforce
from sgnn_tpu.utils.torch_import import import_single_scale

from torch_oracle import OracleEPD


def reference_build_mlp(in_dim, hidden, out_dim, nlayers):
    """build_mlp with the reference's child naming (graph_network.py:39-43)."""
    sizes = [in_dim] + [hidden] * nlayers + [out_dim]
    mlp = nn.Sequential()
    for i in range(len(sizes) - 1):
        mlp.add_module(f"NN-{i}", nn.Linear(sizes[i], sizes[i + 1]))
        mlp.add_module(f"Act-{i}", nn.ReLU() if i < len(sizes) - 2 else nn.Identity())
    return mlp


class ReferenceLayoutEPD(nn.Module):
    """Module tree whose state_dict keys match the reference exactly."""

    def __init__(self, node_in, edge_in, node_out, d, steps, nlayers):
        super().__init__()

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.node_fn = nn.Sequential(
                    reference_build_mlp(node_in, d, d, nlayers), nn.LayerNorm(d)
                )
                self.edge_fn = nn.Sequential(
                    reference_build_mlp(edge_in, d, d, nlayers), nn.LayerNorm(d)
                )

        class IN(nn.Module):
            def __init__(self):
                super().__init__()
                self.node_fn = nn.Sequential(
                    reference_build_mlp(2 * d, d, d, nlayers), nn.LayerNorm(d)
                )
                self.edge_fn = nn.Sequential(
                    reference_build_mlp(3 * d, d, d, nlayers), nn.LayerNorm(d)
                )

        class Processor(nn.Module):
            def __init__(self):
                super().__init__()
                self.gnn_stacks = nn.ModuleList([IN() for _ in range(steps)])

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.node_fn = reference_build_mlp(d, d, node_out, nlayers)

        class EPD(nn.Module):
            def __init__(self):
                super().__init__()
                self._encoder = Encoder()
                self._processor = Processor()
                self._decoder = Decoder()

        self._encode_process_decode = EPD()
        self._particle_type_embedding = nn.Embedding(3, 9)


def test_import_single_scale_forward_parity(rng):
    torch.manual_seed(0)
    node_in, edge_in, node_out, d, steps = 9, 3, 3, 16, 2
    ref = ReferenceLayoutEPD(node_in, edge_in, node_out, d, steps, nlayers=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = jax.tree.map(jnp.asarray, import_single_scale(sd))
    assert "type_embedding" in params
    assert len(params["epd"]["processor"]) == steps

    # forward parity: run our model with imported weights vs a torch oracle
    # loaded with the same weights (copied by module position)
    oracle = OracleEPD(node_in, edge_in, node_out, d, steps, nlayers=1).eval()
    epd_ref = ref._encode_process_decode

    def copy_seq(dst_seq, src_seq):
        with torch.no_grad():
            d_lins = [m for m in dst_seq.modules() if isinstance(m, (nn.Linear, nn.LayerNorm))]
            s_lins = [m for m in src_seq.modules() if isinstance(m, (nn.Linear, nn.LayerNorm))]
            for a, b in zip(d_lins, s_lins):
                a.weight.copy_(b.weight)
                a.bias.copy_(b.bias)

    copy_seq(oracle.node_enc, epd_ref._encoder.node_fn)
    copy_seq(oracle.edge_enc, epd_ref._encoder.edge_fn)
    for blk, src in zip(oracle.blocks, epd_ref._processor.gnn_stacks):
        copy_seq(blk.edge_fn, src.edge_fn)
        copy_seq(blk.node_fn, src.node_fn)
    copy_seq(oracle.decoder, epd_ref._decoder.node_fn)

    n, k = 30, 8
    pos = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 0.6, max_neighbors=k)
    from sgnn_tpu.ops import neighbor_list_to_coo

    s, r, m = (np.asarray(a) for a in neighbor_list_to_coo(nl))
    nf = rng.normal(size=(n, node_in)).astype(np.float32)
    ef = rng.normal(size=(n, k, edge_in)).astype(np.float32)
    mask_flat = np.asarray(nl.mask).reshape(-1)
    with torch.no_grad():
        t_out = oracle(
            torch.tensor(nf),
            torch.tensor(ef.reshape(-1, edge_in)[mask_flat]),
            torch.tensor(s[m], dtype=torch.long),
            torch.tensor(r[m], dtype=torch.long),
        )
    j_out = encode_process_decode_apply(
        params["epd"], jnp.asarray(nf), jnp.asarray(ef), nl
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=5e-5, atol=5e-5)
