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


_SIM_FIX = Path(__file__).parent / "fixtures" / "golden_sim.npz"


@pytest.fixture(scope="module")
def sfix():
    with np.load(_SIM_FIX) as z:
        return {k: z[k] for k in z.files}


def _ss_setup(sfix):
    import dataclasses

    from sgnn_tpu.physics.simulator import NormStats, SimulatorConfig

    n, s, dim, k, d, steps, nlayers, ntypes = (int(v) for v in sfix["ss/meta"])
    r, wall_x = (float(v) for v in sfix["ss/radius"])
    cfg = SimulatorConfig(
        dim=dim, latent_dim=d, num_message_passing_steps=steps,
        num_mlp_layers=nlayers, connectivity_radius=r,
        input_sequence_length=s, num_particle_types=ntypes,
        max_neighbors=k, wall_x=wall_x,
    )
    stats = NormStats(
        vel_mean=jnp.asarray(sfix["ss/vel_mean"]),
        vel_std=jnp.asarray(sfix["ss/vel_std"]),
        acc_mean=jnp.asarray(sfix["ss/acc_mean"]),
        acc_std=jnp.asarray(sfix["ss/acc_std"]),
    )
    flat = {
        key[len("ss/param/"):]: v
        for key, v in sfix.items()
        if key.startswith("ss/param/")
    }
    params = {
        "epd": unflatten_params(flat),
        "type_embedding": {"table": jnp.asarray(sfix["ss/emb_table"])},
    }
    return cfg, stats, params


def test_simulator_chain_matches_golden(sfix):
    """Features -> EPD -> Euler/inverse-Euler pinned to committed bytes
    recorded from plain-numpy feature/integration derivations + the
    torch oracle (VERDICT r2 #7)."""
    from sgnn_tpu.physics.simulator import (
        encoder_preprocess,
        predict_accelerations,
        predict_positions,
    )

    cfg, stats, params = _ss_setup(sfix)
    seq = jnp.asarray(sfix["ss/seq"])
    types = jnp.asarray(sfix["ss/types"])

    nf, _, _ = encoder_preprocess(params, cfg, stats, seq, types, None)
    np.testing.assert_allclose(
        np.asarray(nf), sfix["ss/node_feat"], rtol=2e-5, atol=2e-5
    )

    pred_acc, target_acc, strain = predict_accelerations(
        params, cfg, stats, jnp.asarray(sfix["ss/next_gt"]),
        jnp.zeros_like(seq), seq, types,
    )
    np.testing.assert_allclose(
        np.asarray(pred_acc), sfix["ss/golden_norm_acc"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain), sfix["ss/golden_strain"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(target_acc), sfix["ss/golden_target_acc"], rtol=2e-5, atol=2e-5
    )

    next_pos, strain2 = predict_positions(params, cfg, stats, seq, types)
    np.testing.assert_allclose(
        np.asarray(next_pos), sfix["ss/golden_next_pos"], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain2), sfix["ss/golden_strain"], rtol=2e-4, atol=2e-5
    )


def test_simulator_fused_path_matches_golden(sfix):
    """The flat fused (packed-gather, symmetric-VJP) execution path
    reproduces the same committed bytes as the readable path."""
    import dataclasses

    from sgnn_tpu.physics.simulator import forward_batched

    cfg, stats, params = _ss_setup(sfix)
    cfg = dataclasses.replace(
        cfg, domain=((-4.0, -3.0), (2.0, 3.0)), symmetric_gather=True
    )
    seq = jnp.asarray(sfix["ss/seq"])[None]
    types = jnp.asarray(sfix["ss/types"])[None]
    acc, strain = forward_batched(params, cfg, stats, seq, types)
    np.testing.assert_allclose(
        np.asarray(acc[0]), sfix["ss/golden_norm_acc"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain[0]), sfix["ss/golden_strain"], rtol=2e-4, atol=2e-5
    )


def test_ms_chain_matches_golden(sfix):
    """Multi-scale features + MSGNN (both COO and dense-plan paths)
    pinned to committed bytes from numpy features + the torch ms oracle."""
    from sgnn_tpu.physics.multi_scale_graph import (
        PaddedEdges,
        StaticGraph,
        build_dense_static_graph,
    )
    from sgnn_tpu.physics.multi_scale_simulator import (
        MultiScaleSimulatorConfig,
        _forward,
        ms_encoder_preprocess,
    )
    from sgnn_tpu.physics.simulator import NormStats

    mn, ms_d, ms_steps, ms_nlayers = (int(v) for v in sfix["ms/meta"])
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=ms_d, num_message_passing_steps=ms_steps,
        num_mlp_layers=ms_nlayers, input_sequence_length=int(sfix["ss/meta"][1]),
        num_scales=2, window_size=2, radius_multiplier=2.0,
    )
    stats = NormStats(
        vel_mean=jnp.asarray(sfix["ss/vel_mean"]),
        vel_std=jnp.asarray(sfix["ss/vel_std"]),
        acc_mean=jnp.asarray(sfix["ss/acc_mean"]),
        acc_std=jnp.asarray(sfix["ss/acc_std"]),
    )
    flat = {
        key[len("ms/param/"):]: v
        for key, v in sfix.items()
        if key.startswith("ms/param/")
    }
    params = {"gnn": unflatten_params(flat)}
    graph = StaticGraph(
        **{
            t: PaddedEdges(
                senders=jnp.asarray(sfix[f"ms/{t}_senders"]),
                receivers=jnp.asarray(sfix[f"ms/{t}_receivers"]),
                mask=jnp.asarray(sfix[f"ms/{t}_mask"]),
            )
            for t in ("g2m", "m2m", "m2g")
        }
    )
    seq = jnp.asarray(sfix["ms/seq"])
    types = jnp.zeros(mn, jnp.int32)

    nf, _ = ms_encoder_preprocess(params, cfg, stats, seq, types, graph)
    np.testing.assert_allclose(
        np.asarray(nf), sfix["ms/node_feat"], rtol=2e-5, atol=2e-5
    )

    acc, strain = _forward(params, cfg, stats, seq, types, graph)
    golden = sfix["ms/golden_out"]
    np.testing.assert_allclose(np.asarray(acc), golden[:, :2], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(strain), golden[:, -1], rtol=5e-4, atol=5e-5)

    # dense-plan execution path, same bytes
    dg = build_dense_static_graph(
        cfg.graph_config, np.asarray(sfix["ms/grid"]),
        g2m_rows=64, m2m_rows=32, m2g_rows=64,
    )
    dacc, dstrain = _forward(params, cfg, stats, seq, types, jax.tree.map(jnp.asarray, dg))
    np.testing.assert_allclose(np.asarray(dacc), golden[:, :2], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dstrain), golden[:, -1], rtol=5e-4, atol=5e-5)
