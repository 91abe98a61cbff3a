"""Golden-value parity: pin recorded oracle activations (VERDICT r1 #5).

tests/fixtures/golden_epd.npz freezes torch-oracle inputs, weights and
per-stage activations (scripts/make_golden_fixture.py). Two independent
pins protect against silent drift of EITHER side:
  * the JAX model on the recorded weights must reproduce the recorded
    activations (no torch needed at test time),
  * the torch oracle rebuilt from the recorded weights must reproduce
    them too (guards oracle edits changing the ground truth).
The open loop of running a REAL reference checkpoint (PyG uninstallable
here) remains documented in docs/PARITY.md.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_FIX = Path(__file__).parent / "fixtures" / "golden_epd.npz"


@pytest.fixture(scope="module")
def fix():
    with np.load(_FIX) as z:
        return {k: z[k] for k in z.files}


def unflatten_params(flat: dict) -> dict:
    """'a/b/0/w' -> nested dicts with ints as list indices."""
    root = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p, nxt in zip(parts[:-1], parts[1:]):
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def golden_params(fix):
    flat = {
        k[len("param/"):]: v for k, v in fix.items() if k.startswith("param/")
    }
    return unflatten_params(flat)


def test_jax_model_matches_golden(fix):
    from sgnn_tpu.models import encode_process_decode_apply
    from sgnn_tpu.ops.neighbors import NeighborList

    params = golden_params(fix)
    nl = NeighborList(
        senders=jnp.asarray(fix["nl_senders"]), mask=jnp.asarray(fix["nl_mask"])
    )
    out, acts = _jax_forward_with_acts(params, fix, nl)
    np.testing.assert_allclose(out, fix["golden_output"], rtol=2e-5, atol=2e-5)
    mask_flat = fix["nl_mask"].reshape(-1)
    for name, a in acts.items():
        golden = fix[f"act/{name}"]
        if a.ndim == 3:  # dense [N, K, D] -> COO rows for comparison
            a = a.reshape(-1, a.shape[-1])[mask_flat]
        np.testing.assert_allclose(a, golden, rtol=2e-5, atol=2e-5, err_msg=name)


def _jax_forward_with_acts(params, fix, nl):
    from sgnn_tpu.models.encode_process_decode import interaction_network_apply
    from sgnn_tpu.nn import mlp_ln_apply
    from sgnn_tpu.nn.core import mlp_apply

    nf = jnp.asarray(fix["node_feat"])
    ef = jnp.asarray(fix["edge_feat_dense"])
    acts = {}
    x = mlp_ln_apply(params["encoder"]["node"], nf)
    e = mlp_ln_apply(params["encoder"]["edge"], ef)
    e = e * nl.mask[..., None].astype(e.dtype)
    acts["node_enc"] = np.asarray(x)
    acts["edge_enc"] = np.asarray(e)
    for i, blk in enumerate(params["processor"]):
        x, e = interaction_network_apply(blk, x, e, nl)
        acts[f"block{i}/x"] = np.asarray(x)
        acts[f"block{i}/e"] = np.asarray(e)
    out = mlp_apply(params["decoder"], x)
    return np.asarray(out), acts


def test_torch_oracle_matches_golden(fix):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from torch_oracle import OracleEPD

    node_in, edge_in, node_out, d, steps, nlayers = (int(v) for v in fix["meta"])
    torch.manual_seed(0)  # weights overwritten below; seed irrelevant
    oracle = OracleEPD(node_in, edge_in, node_out, d, steps, nlayers).eval()

    def load_mlp(seq, flat, prefix):
        i = 0
        for mod in seq:
            if isinstance(mod, nn.Linear):
                mod.weight.data = torch.tensor(
                    fix[f"param/{prefix}/layers/{i}/w"].T.copy()
                )
                mod.bias.data = torch.tensor(fix[f"param/{prefix}/layers/{i}/b"])
                i += 1

    def load_mlp_ln(seq, prefix):
        load_mlp(seq[0], fix, f"{prefix}/mlp")
        seq[1].weight.data = torch.tensor(fix[f"param/{prefix}/ln/scale"])
        seq[1].bias.data = torch.tensor(fix[f"param/{prefix}/ln/bias"])

    load_mlp_ln(oracle.node_enc, "encoder/node")
    load_mlp_ln(oracle.edge_enc, "encoder/edge")
    for i, blk in enumerate(oracle.blocks):
        load_mlp_ln(blk.edge_fn, f"processor/{i}/edge")
        load_mlp_ln(blk.node_fn, f"processor/{i}/node")
    load_mlp(oracle.decoder, fix, "decoder")

    with torch.no_grad():
        out = oracle(
            torch.tensor(fix["node_feat"]),
            torch.tensor(fix["coo_edge_feat"]),
            torch.tensor(fix["coo_senders"]),
            torch.tensor(fix["coo_receivers"]),
        ).numpy()
    np.testing.assert_allclose(out, fix["golden_output"], rtol=1e-6, atol=1e-6)
