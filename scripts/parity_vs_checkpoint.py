"""Real-checkpoint parity driver: reference .pt/.npz -> per-stage diffs.

Executes the docs/PARITY.md protocol against an ACTUAL reference
checkpoint the moment one becomes available (VERDICT r4 missing #1: the
protocol existed but had no ready-to-run driver, so the item stayed
blocked even if a checkpoint appeared). One command:

  python scripts/parity_vs_checkpoint.py \
      --checkpoint model-best-020000.pt \
      --input case0.npz [--family auto] [--metadata metadata.json] \
      [--tol 2e-4]

Checkpoint: a reference torch state_dict — either the raw ``.pt``
(loaded with torch, layout per learned_simulator.py:519-537 /
multi_scale_simulator.py:362-376) or an ``.npz`` holding the same keys
numpy-exported (no torch needed). The family (single/multi-scale) is
auto-detected from the key prefix (``_encode_process_decode`` vs
``_multi_scale_gnn``).

Input npz:
  position_sequence  f32[N, S, dim]   required
  particle_types     int[N]           optional (default zeros)
  vel_mean/vel_std/acc_mean/acc_std   optional (else --metadata, else
                                      identity stats)
  expect/<stage>     f32[...]         optional reference activations;
                                      any stage present is diffed and
                                      counted toward pass/fail

Stages printed (node-indexed, so edge ordering differences between
torch_cluster and our search cannot produce false mismatches —
SURVEY.md §7.3):
  single-scale: node_feat, node_enc, block{i}/x (per processor step),
                output, next_positions
  multi-scale:  node_feat, node_enc (grid encoder), g2m/x, m2m{i}/x,
                m2g/x, output, next_positions

Exit code 0 iff every provided expect/ stage is within --tol max-abs
diff. Exercised in tests/test_aux.py against the committed golden
oracle fixtures as a checkpoint stand-in.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # parity is a numerics check

import jax.numpy as jnp  # noqa: E402

from sgnn_tpu.nn.core import layer_norm_apply, mlp_apply, mlp_ln_apply  # noqa: E402
from sgnn_tpu.utils.torch_import import (  # noqa: E402
    import_multi_scale,
    import_single_scale,
    load_torch_checkpoint,
)


def load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path) as d:
            return {k: d[k] for k in d.files}
    return load_torch_checkpoint(path)


def detect_family(sd: dict) -> str:
    if any(k.startswith("_multi_scale_gnn") for k in sd):
        return "multi"
    if any(k.startswith("_encode_process_decode") for k in sd):
        return "single"
    raise SystemExit(
        "cannot detect model family: no _encode_process_decode or "
        "_multi_scale_gnn keys in the checkpoint"
    )


def load_stats(inp: dict, metadata_path: str | None, dim: int, noise_std: float):
    from sgnn_tpu.physics.simulator import NormStats

    def get(name):
        if name in inp:
            return jnp.asarray(inp[name])
        return None

    vals = {k: get(k) for k in ("vel_mean", "vel_std", "acc_mean", "acc_std")}
    if metadata_path:
        meta = json.loads(Path(metadata_path).read_text())
        for k in vals:
            if vals[k] is None and k in meta:
                vals[k] = jnp.asarray(meta[k], jnp.float32)
        # fold noise into stds exactly like the reference trainer
        # (train.py:446-457) when metadata stats are used
        for k in ("vel_std", "acc_std"):
            if vals[k] is not None and noise_std > 0:
                vals[k] = jnp.sqrt(vals[k] ** 2 + noise_std**2)
    for k in vals:
        if vals[k] is None:
            vals[k] = jnp.zeros(dim) if k.endswith("mean") else jnp.ones(dim)
    return NormStats(**vals)


def run_single(params, seq, types, stats, args):
    """Single-scale per-stage chain (readable path; epd_flat is pinned
    equal to it by tests/test_epd_flat.py)."""
    from sgnn_tpu.models.encode_process_decode import interaction_network_apply
    from sgnn_tpu.physics.simulator import (
        SimulatorConfig,
        decoder_postprocess,
        encoder_preprocess,
    )

    n, s, dim = seq.shape
    steps = len(params["epd"]["processor"])
    num_types = (
        params["type_embedding"]["table"].shape[0]
        if "type_embedding" in params
        else 1
    )
    emb_dim = (
        params["type_embedding"]["table"].shape[1]
        if "type_embedding" in params
        else 9
    )
    cfg = SimulatorConfig(
        dim=dim,
        latent_dim=params["epd"]["decoder"]["layers"][0]["w"].shape[0],
        num_message_passing_steps=steps,
        input_sequence_length=s,
        connectivity_radius=args.radius,
        max_neighbors=args.max_neighbors,
        num_particle_types=num_types,
        particle_type_embedding_size=emb_dim,
        wall_x=args.wall_x,
    )
    node_f, edge_f, nl = encoder_preprocess(params, cfg, stats, seq, types)
    stages = {"node_feat": node_f}

    epd = params["epd"]
    mask = nl.mask[..., None].astype(node_f.dtype)
    x = layer_norm_apply(
        epd["encoder"]["node"]["ln"],
        mlp_apply(epd["encoder"]["node"]["mlp"], node_f),
    )
    e = layer_norm_apply(
        epd["encoder"]["edge"]["ln"], mlp_apply(epd["encoder"]["edge"]["mlp"], edge_f)
    ) * mask
    stages["node_enc"] = x
    for i, step_params in enumerate(epd["processor"]):
        x, e = interaction_network_apply(step_params, x, e, nl)
        stages[f"block{i}/x"] = x
    out = mlp_apply(epd["decoder"], x)
    stages["output"] = out
    stages["next_positions"] = decoder_postprocess(stats, out[:, :dim], seq)
    return stages


def run_multi(params, seq, types, stats, args):
    """Multi-scale per-stage chain (COO path; dense is pinned equal)."""
    from sgnn_tpu.models.multi_scale import _interact
    from sgnn_tpu.physics.multi_scale_graph import build_static_graph
    from sgnn_tpu.physics.multi_scale_simulator import (
        MultiScaleSimulatorConfig,
        ms_encoder_preprocess,
    )
    from sgnn_tpu.physics.simulator import decoder_postprocess

    n, s, dim = seq.shape
    gnn = params["gnn"]
    num_types = (
        params["type_embedding"]["table"].shape[0]
        if "type_embedding" in params
        else 1
    )
    emb_dim = (
        params["type_embedding"]["table"].shape[1]
        if "type_embedding" in params
        else 9
    )
    cfg = MultiScaleSimulatorConfig(
        dim=dim,
        latent_dim=gnn["prediction_head"]["layers"][0]["w"].shape[0],
        num_message_passing_steps=len(gnn["m2m_blocks"]),
        input_sequence_length=s,
        num_particle_types=num_types,
        particle_type_embedding_size=emb_dim,
        num_scales=args.num_scales,
        window_size=args.window_size,
        radius_multiplier=args.radius_multiplier,
        wall_x=args.wall_x,
    )
    pos0 = np.asarray(seq[:, 0], np.float64)
    graph = jax.tree.map(
        jnp.asarray,
        build_static_graph(
            cfg.graph_config,
            pos0,
            g2m_pad=args.edge_pad,
            m2m_pad=args.edge_pad,
            m2g_pad=args.edge_pad,
        ),
    )
    node_f, edge_f = ms_encoder_preprocess(params, cfg, stats, seq, types, graph)
    stages = {"node_feat": node_f}
    x = mlp_ln_apply(gnn["grid_node_encoder"], node_f)
    stages["node_enc"] = x
    e = {
        t: mlp_ln_apply(gnn[f"{t}_edge_encoder"], edge_f[t])
        * getattr(graph, t).mask[:, None].astype(x.dtype)
        for t in ("g2m", "m2m", "m2g")
    }
    x, e["g2m"] = _interact(gnn["g2m_block"], x, e["g2m"], graph.g2m)
    stages["g2m/x"] = x
    for i, block in enumerate(gnn["m2m_blocks"]):
        x, e["m2m"] = _interact(block, x, e["m2m"], graph.m2m)
        stages[f"m2m{i}/x"] = x
    x, e["m2g"] = _interact(gnn["m2g_block"], x, e["m2g"], graph.m2g)
    stages["m2g/x"] = x
    out = mlp_apply(gnn["prediction_head"], x)
    stages["output"] = out
    stages["next_positions"] = decoder_postprocess(stats, out[:, :dim], seq)
    return stages


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True, help=".pt or .npz state_dict")
    ap.add_argument("--input", required=True, help="input npz (see module doc)")
    ap.add_argument("--family", default="auto", choices=["auto", "single", "multi"])
    ap.add_argument("--metadata", default=None, help="metadata.json for stats")
    ap.add_argument("--noise-std", type=float, default=0.0,
                    help="fold into metadata stds like the reference trainer")
    ap.add_argument("--tol", type=float, default=2e-4,
                    help="max-abs tolerance per provided expect/ stage")
    # single-scale graph knobs (reference config.yaml defaults)
    ap.add_argument("--radius", type=float, default=0.6)
    ap.add_argument("--max-neighbors", type=int, default=20)
    ap.add_argument("--wall-x", type=float, default=-2.0, dest="wall_x")
    # multi-scale hierarchy knobs (multi_scale_config.yaml defaults)
    ap.add_argument("--num-scales", type=int, default=2, dest="num_scales")
    ap.add_argument("--window-size", type=int, default=2, dest="window_size")
    ap.add_argument("--radius-multiplier", type=float, default=2.0,
                    dest="radius_multiplier")
    ap.add_argument("--edge-pad", type=int, default=1 << 17, dest="edge_pad")
    args = ap.parse_args()

    sd = load_state_dict(args.checkpoint)
    family = detect_family(sd) if args.family == "auto" else args.family
    params = jax.tree.map(
        jnp.asarray,
        import_single_scale(sd) if family == "single" else import_multi_scale(sd),
    )
    print(f"family: {family}  checkpoint keys: {len(sd)}")

    with np.load(args.input) as d:
        inp = {k: d[k] for k in d.files}
    seq = jnp.asarray(inp.get("position_sequence", inp.get("positions")))
    if seq is None:
        raise SystemExit("input npz needs position_sequence [N, S, dim]")
    n, s, dim = seq.shape
    types = jnp.asarray(inp.get("particle_types", np.zeros(n, np.int32)))
    stats = load_stats(inp, args.metadata, dim, args.noise_std)
    print(f"input: N={n} S={s} dim={dim}")

    runner = run_single if family == "single" else run_multi
    stages = runner(params, seq, types, stats, args)

    failures = 0
    checked = 0
    for name, val in stages.items():
        val = np.asarray(val)
        line = f"  {name:<16s} shape={str(val.shape):<14s} |x|max={np.abs(val).max():.4e}"
        key = f"expect/{name}"
        if key in inp:
            diff = float(np.abs(val - inp[key]).max())
            ok = diff <= args.tol
            checked += 1
            failures += 0 if ok else 1
            line += f"  max-abs-diff={diff:.3e} {'OK' if ok else 'FAIL'}"
        print(line)
    if checked:
        print(f"{checked - failures}/{checked} provided stages within tol={args.tol}")
    else:
        print("no expect/ stages in input npz — stats printed only")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
