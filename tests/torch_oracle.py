"""Plain-torch oracle of the reference architecture, for parity tests.

The reference depends on torch_geometric/torch_cluster (unavailable here),
so this oracle re-derives the documented math of
sgnn/single_scale/graph_network.py with vanilla torch ops: the PyG
MessagePassing dispatch becomes an explicit gather + index_add_ with the
same dataflow (x_i = receiver, x_j = sender, sum aggregation at receivers,
flow source_to_target). It exists purely as a numerical ground truth for
the JAX implementation; it is NOT part of the framework.
"""

import numpy as np
import torch
import torch.nn as nn


def build_mlp(in_dim, hidden, out_dim, nlayers):
    sizes = [in_dim] + [hidden] * nlayers + [out_dim]
    mods = []
    for i in range(len(sizes) - 1):
        mods.append(nn.Linear(sizes[i], sizes[i + 1]))
        if i < len(sizes) - 2:
            mods.append(nn.ReLU())
    return nn.Sequential(*mods)


class OracleInteractionNetwork(nn.Module):
    def __init__(self, d, hidden, nlayers):
        super().__init__()
        self.edge_fn = nn.Sequential(build_mlp(3 * d, hidden, d, nlayers), nn.LayerNorm(d))
        self.node_fn = nn.Sequential(build_mlp(2 * d, hidden, d, nlayers), nn.LayerNorm(d))

    def forward(self, x, senders, receivers, e):
        x_res, e_res = x, e
        msg = self.edge_fn(torch.cat([x[receivers], x[senders], e], dim=-1))
        agg = torch.zeros_like(x).index_add_(0, receivers, msg)
        x_new = self.node_fn(torch.cat([agg, x], dim=-1))
        return x_new + x_res, msg + e_res


class OracleEPD(nn.Module):
    def __init__(self, node_in, edge_in, node_out, d, steps, nlayers, hidden=None):
        super().__init__()
        hidden = hidden or d
        self.node_enc = nn.Sequential(build_mlp(node_in, hidden, d, nlayers), nn.LayerNorm(d))
        self.edge_enc = nn.Sequential(build_mlp(edge_in, hidden, d, nlayers), nn.LayerNorm(d))
        self.blocks = nn.ModuleList(
            [OracleInteractionNetwork(d, hidden, nlayers) for _ in range(steps)]
        )
        self.decoder = build_mlp(d, hidden, node_out, nlayers)

    def forward(self, node_feat, edge_feat, senders, receivers):
        x = self.node_enc(node_feat)
        e = self.edge_enc(edge_feat)
        for blk in self.blocks:
            x, e = blk(x, senders, receivers, e)
        return self.decoder(x)


def copy_mlp_to_jax(torch_seq):
    """torch build_mlp Sequential -> {'layers': [{'w','b'}...]} jax layout."""
    layers = []
    for mod in torch_seq:
        if isinstance(mod, nn.Linear):
            layers.append(
                {
                    "w": mod.weight.detach().numpy().T.copy(),
                    "b": mod.bias.detach().numpy().copy(),
                }
            )
    return {"layers": layers}


def copy_mlp_ln_to_jax(torch_seq):
    """Sequential(build_mlp, LayerNorm) -> {'mlp','ln'} jax layout."""
    mlp_part, ln = torch_seq[0], torch_seq[1]
    return {
        "mlp": copy_mlp_to_jax(mlp_part),
        "ln": {
            "scale": ln.weight.detach().numpy().copy(),
            "bias": ln.bias.detach().numpy().copy(),
        },
    }


def copy_epd_to_jax(oracle: OracleEPD):
    return {
        "encoder": {
            "node": copy_mlp_ln_to_jax(oracle.node_enc),
            "edge": copy_mlp_ln_to_jax(oracle.edge_enc),
        },
        "processor": [
            {
                "edge": copy_mlp_ln_to_jax(blk.edge_fn),
                "node": copy_mlp_ln_to_jax(blk.node_fn),
            }
            for blk in oracle.blocks
        ],
        "decoder": copy_mlp_to_jax(oracle.decoder),
    }
