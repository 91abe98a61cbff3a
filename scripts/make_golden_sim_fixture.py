"""Generate tests/fixtures/golden_sim.npz — golden values through the
FULL simulator chain (VERDICT r2 #7).

golden_epd.npz stops at the EPD model boundary; this fixture extends the
committed-bytes protection through everything around it:
  * node-feature engineering (normalized velocity window, wall distance,
    particle-type embedding) — derived here in PLAIN NUMPY from the
    reference equations (learned_simulator.py:269-316), independent of
    the JAX implementation,
  * edge features from the radius graph,
  * the torch-oracle EPD forward on those features,
  * Euler integration and the inverse-Euler training target
    (learned_simulator.py:381-411, 493-517), also plain numpy,
  * one multi-scale forward: numpy ms features (wall normalized by grid
    radius — the family asymmetry, multi_scale_simulator.py:190-192) +
    the torch OracleMSGNN on the static hierarchy.

Tests (test_golden_parity.py) pin the JAX readable path, the fused
flat/packed path AND the ms paths against these recorded bytes — silent
drift anywhere in physics/simulator.py's chain now fails a committed
fixture.

Run from the repo root (only to regenerate):
    python scripts/make_golden_sim_fixture.py
"""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from torch_oracle import OracleEPD, copy_epd_to_jax
from test_multi_scale import OracleMSGNN, _oracle_params_to_jax, square_grid
from make_golden_fixture import flatten_params

from sgnn_tpu.ops import neighbor_list_to_coo, radius_neighbors_bruteforce
from sgnn_tpu.physics.multi_scale_graph import MultiScaleConfig, build_static_graph


def main():
    rng = np.random.default_rng(77)
    torch.manual_seed(77)
    fixture = {}

    # ---------------- single-scale chain ----------------------------------
    n, s, dim, r, k = 40, 5, 2, 0.5, 16
    d, steps, nlayers = 32, 3, 1
    ntypes, emb_dim = 3, 9
    wall_x = -2.0
    node_in = (s - 1) * dim + 1 + emb_dim  # 18
    vel_mean = np.asarray([0.01, -0.02], np.float32)
    vel_std = np.asarray([1.1, 0.9], np.float32)
    acc_mean = np.asarray([0.003, 0.004], np.float32)
    acc_std = np.asarray([1.2, 0.8], np.float32)

    base = rng.uniform(-1.9, -0.4, size=(n, 1)).astype(np.float32)
    base = np.concatenate(
        [base, rng.uniform(-1.0, 1.0, size=(n, 1)).astype(np.float32)], axis=1
    )
    seq = (
        base[:, None, :]
        + rng.normal(scale=0.01, size=(n, s, dim)).cumsum(1)
    ).astype(np.float32)
    next_gt = (seq[:, -1] + rng.normal(scale=0.02, size=(n, dim))).astype(np.float32)
    types = rng.integers(0, ntypes, size=(n,)).astype(np.int32)
    emb_table = rng.normal(scale=0.5, size=(ntypes, emb_dim)).astype(np.float32)

    # --- numpy feature derivation (learned_simulator.py:269-316) ----------
    last = seq[:, -1]
    vel = np.diff(seq, axis=1)  # [n, s-1, dim]
    norm_vel = ((vel - vel_mean) / vel_std).reshape(n, -1).astype(np.float32)
    wall = np.clip(last[:, 0:1] - wall_x, 0.0, r).astype(np.float32)  # RAW
    node_feat = np.concatenate([norm_vel, wall, emb_table[types]], axis=1)

    nl = radius_neighbors_bruteforce(jnp.asarray(last), r, max_neighbors=k)
    deg = np.asarray(nl.mask).sum(1)
    assert deg.max() < k, "fixture requires an unbound cap (symmetric graph)"
    s_flat, r_flat, m_flat = (np.asarray(a) for a in neighbor_list_to_coo(nl))
    senders, receivers = s_flat[m_flat], r_flat[m_flat]
    disp = (last[senders] - last[receivers]) / r
    dist = np.linalg.norm(disp, axis=-1, keepdims=True)
    edge_feat = np.concatenate([disp, dist], axis=-1).astype(np.float32)

    oracle = OracleEPD(node_in, dim + 1, dim + 1, d, steps, nlayers).eval()
    with torch.no_grad():
        out = oracle(
            torch.tensor(node_feat),
            torch.tensor(edge_feat),
            torch.tensor(senders, dtype=torch.long),
            torch.tensor(receivers, dtype=torch.long),
        ).numpy()
    norm_acc, strain = out[:, :dim], out[:, -1]

    # --- numpy Euler + inverse-Euler (learned_simulator.py:381-411,493-517)
    acc = norm_acc * acc_std + acc_mean
    v_next = (last - seq[:, -2]) + acc
    next_pos = last + v_next  # golden Euler integration
    next_vel = next_gt - last
    tgt_acc_raw = next_vel - (last - seq[:, -2])
    target_acc = ((tgt_acc_raw - acc_mean) / acc_std).astype(np.float32)

    fixture.update(
        {
            "ss/seq": seq,
            "ss/next_gt": next_gt,
            "ss/types": types,
            "ss/emb_table": emb_table,
            "ss/vel_mean": vel_mean, "ss/vel_std": vel_std,
            "ss/acc_mean": acc_mean, "ss/acc_std": acc_std,
            "ss/node_feat": node_feat,
            "ss/golden_norm_acc": norm_acc.astype(np.float32),
            "ss/golden_strain": strain.astype(np.float32),
            "ss/golden_next_pos": next_pos.astype(np.float32),
            "ss/golden_target_acc": target_acc,
            "ss/meta": np.asarray([n, s, dim, k, d, steps, nlayers, ntypes], np.int64),
            "ss/radius": np.asarray([r, wall_x], np.float32),
        }
    )
    fixture.update(
        {f"ss/param/{kk}": v for kk, v in flatten_params(copy_epd_to_jax(oracle)).items()}
    )

    # ---------------- multi-scale chain ------------------------------------
    ms_d, ms_steps, ms_nlayers = 16, 2, 2
    ms_node_in = (s - 1) * dim + 1  # single-type
    ms_cfg = MultiScaleConfig(num_scales=2, window_size=2, radius_multiplier=2.0)
    grid = square_grid(6).astype(np.float32)
    mn = len(grid)
    sg = build_static_graph(ms_cfg, grid, g2m_pad=512, m2m_pad=256, m2g_pad=512)

    ms_seq = (
        grid[:, None, :] + rng.normal(scale=0.01, size=(mn, s, dim)).cumsum(1)
    ).astype(np.float32)
    ms_last = ms_seq[:, -1]
    ms_vel = np.diff(ms_seq, axis=1)
    ms_norm_vel = ((ms_vel - vel_mean) / vel_std).reshape(mn, -1).astype(np.float32)
    gr = ms_cfg.grid_radius
    # the family asymmetry: wall distance NORMALIZED by the grid radius
    ms_wall = (np.clip(ms_last[:, 0:1] - wall_x, 0.0, gr) / gr).astype(np.float32)
    ms_nf = np.concatenate([ms_norm_vel, ms_wall], axis=1)

    ef_torch, edges_torch = {}, {}
    radii = {"g2m": gr, "m2m": ms_cfg.coarsest_radius, "m2g": gr}
    for key in ("g2m", "m2m", "m2g"):
        pe = getattr(sg, key)
        sd, rv, mk = pe.senders[pe.mask], pe.receivers[pe.mask], pe.mask
        dsp = (ms_last[sd] - ms_last[rv]) / radii[key]
        dst = np.linalg.norm(dsp, axis=-1, keepdims=True)
        ef_torch[key] = torch.tensor(
            np.concatenate([dsp, dst], -1).astype(np.float32)
        )
        edges_torch[key] = (
            torch.tensor(sd, dtype=torch.long),
            torch.tensor(rv, dtype=torch.long),
        )
        fixture[f"ms/{key}_senders"] = pe.senders
        fixture[f"ms/{key}_receivers"] = pe.receivers
        fixture[f"ms/{key}_mask"] = pe.mask

    ms_oracle = OracleMSGNN(
        ms_node_in, dim + 1, dim + 1, ms_d, ms_steps, ms_nlayers
    ).eval()
    with torch.no_grad():
        ms_out = ms_oracle(torch.tensor(ms_nf), ef_torch, edges_torch).numpy()

    fixture.update(
        {
            "ms/seq": ms_seq,
            "ms/grid": grid,
            "ms/node_feat": ms_nf,
            "ms/golden_out": ms_out.astype(np.float32),
            "ms/meta": np.asarray([mn, ms_d, ms_steps, ms_nlayers], np.int64),
        }
    )
    fixture.update(
        {
            f"ms/param/{kk}": v
            for kk, v in flatten_params(_oracle_params_to_jax(ms_oracle)).items()
        }
    )

    dst = Path(__file__).parent.parent / "tests" / "fixtures"
    dst.mkdir(exist_ok=True)
    np.savez_compressed(dst / "golden_sim.npz", **fixture)
    print(
        f"wrote {dst/'golden_sim.npz'} "
        f"({(dst/'golden_sim.npz').stat().st_size/1024:.0f} KiB), "
        f"{len(fixture)} arrays; ss checksum {out.sum():.6f}, "
        f"ms checksum {ms_out.sum():.6f}"
    )


if __name__ == "__main__":
    main()
