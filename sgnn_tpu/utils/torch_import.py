"""Weight-import shim: reference PyTorch checkpoints -> sgnn-tpu params.

The reference saves plain state_dicts (learned_simulator.py:519-527,
multi_scale_simulator.py:362-368) whose key layout follows its module
tree — notably the ``build_mlp`` Sequential with named children "NN-i" /
"Act-i" (graph_network.py:39-43) wrapped as ``Sequential(mlp, LayerNorm)``.
This module maps that layout onto our functional param pytrees so a
trained reference model can be evaluated/parity-checked in this
framework (BASELINE.md: per-layer activation allclose).

Input: a dict of numpy arrays (e.g. ``{k: v.numpy() for k, v in
torch.load(path, map_location='cpu').items()}``) — torch itself is only
needed to read the .pt file, not here.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


Arrays = Mapping[str, np.ndarray]


def _mlp_from(prefix: str, sd: Arrays) -> dict:
    """build_mlp Sequential ('NN-0', 'Act-0', ...) -> {'layers': [...]}."""
    layers = []
    i = 0
    while f"{prefix}.NN-{i}.weight" in sd:
        layers.append(
            {
                # torch Linear stores [out, in]; we store [in, out]
                "w": np.ascontiguousarray(sd[f"{prefix}.NN-{i}.weight"].T),
                "b": np.asarray(sd[f"{prefix}.NN-{i}.bias"]),
            }
        )
        i += 1
    if not layers:
        raise KeyError(f"no NN-i linears under '{prefix}'")
    return {"layers": layers}


def _mlp_ln_from(prefix: str, sd: Arrays) -> dict:
    """Sequential(build_mlp, LayerNorm) -> {'mlp', 'ln'}; the mlp is child
    '0' and the LayerNorm child '1'."""
    return {
        "mlp": _mlp_from(f"{prefix}.0", sd),
        "ln": {
            "scale": np.asarray(sd[f"{prefix}.1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.1.bias"]),
        },
    }


def import_single_scale(sd: Arrays) -> dict:
    """LearnedSimulator state_dict -> sgnn_tpu simulator params.

    Key layout (learned_simulator.py:51-62 + graph_network.py):
      _particle_type_embedding.weight
      _encode_process_decode._encoder.{node_fn,edge_fn}.{0:mlp,1:ln}
      _encode_process_decode._processor.gnn_stacks.{m}.{edge_fn,node_fn}
      _encode_process_decode._decoder.node_fn
    """
    epd = "_encode_process_decode"
    steps = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"{epd}\._processor\.gnn_stacks\.(\d+)\.", k)]
            if m
        }
    )
    params: Dict = {
        "epd": {
            "encoder": {
                "node": _mlp_ln_from(f"{epd}._encoder.node_fn", sd),
                "edge": _mlp_ln_from(f"{epd}._encoder.edge_fn", sd),
            },
            "processor": [
                {
                    "edge": _mlp_ln_from(
                        f"{epd}._processor.gnn_stacks.{m}.edge_fn", sd
                    ),
                    "node": _mlp_ln_from(
                        f"{epd}._processor.gnn_stacks.{m}.node_fn", sd
                    ),
                }
                for m in steps
            ],
            "decoder": _mlp_from(f"{epd}._decoder.node_fn", sd),
        }
    }
    if "_particle_type_embedding.weight" in sd:
        params["type_embedding"] = {
            "table": np.asarray(sd["_particle_type_embedding.weight"])
        }
    return params


def import_multi_scale(sd: Arrays) -> dict:
    """MultiScaleSimulator state_dict -> sgnn_tpu multi-scale params.

    Key layout (multi_scale_simulator.py:73-94 + multi_scale_gnn.py):
      _particle_type_embedding.weight
      _multi_scale_gnn.grid_node_encoder / {g2m,m2m,m2g}_edge_encoder
      _multi_scale_gnn.g2m_block / m2m_blocks.{m} / m2g_block
        (each with .edge_fn/.node_fn Sequential(mlp, LN))
      _multi_scale_gnn.prediction_head
    """
    g = "_multi_scale_gnn"
    steps = sorted(
        {
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"{g}\.m2m_blocks\.(\d+)\.", k)]
            if m
        }
    )

    def block(prefix):
        return {
            "edge": _mlp_ln_from(f"{prefix}.edge_fn", sd),
            "node": _mlp_ln_from(f"{prefix}.node_fn", sd),
        }

    params: Dict = {
        "gnn": {
            "grid_node_encoder": _mlp_ln_from(f"{g}.grid_node_encoder", sd),
            "g2m_edge_encoder": _mlp_ln_from(f"{g}.g2m_edge_encoder", sd),
            "m2m_edge_encoder": _mlp_ln_from(f"{g}.m2m_edge_encoder", sd),
            "m2g_edge_encoder": _mlp_ln_from(f"{g}.m2g_edge_encoder", sd),
            "g2m_block": block(f"{g}.g2m_block"),
            "m2m_blocks": [block(f"{g}.m2m_blocks.{m}") for m in steps],
            "m2g_block": block(f"{g}.m2g_block"),
            "prediction_head": _mlp_from(f"{g}.prediction_head", sd),
        }
    }
    if "_particle_type_embedding.weight" in sd:
        params["type_embedding"] = {
            "table": np.asarray(sd["_particle_type_embedding.weight"])
        }
    return params


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pt checkpoint into numpy arrays (needs torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# --------------------------------------------------------------------------
# Inverse direction: our params -> reference state_dict naming. Lets a
# model trained here be evaluated by the reference's torch tooling, and
# gives tests a way to synthesize reference-layout checkpoints for the
# parity driver (scripts/parity_vs_checkpoint.py) without torch.
# --------------------------------------------------------------------------


def _mlp_export(prefix: str, mlp: dict, out: Dict[str, np.ndarray]) -> None:
    for i, layer in enumerate(mlp["layers"]):
        out[f"{prefix}.NN-{i}.weight"] = np.ascontiguousarray(
            np.asarray(layer["w"]).T
        )
        out[f"{prefix}.NN-{i}.bias"] = np.asarray(layer["b"])


def _mlp_ln_export(prefix: str, p: dict, out: Dict[str, np.ndarray]) -> None:
    _mlp_export(f"{prefix}.0", p["mlp"], out)
    out[f"{prefix}.1.weight"] = np.asarray(p["ln"]["scale"])
    out[f"{prefix}.1.bias"] = np.asarray(p["ln"]["bias"])


def export_single_scale(params: dict) -> Dict[str, np.ndarray]:
    """sgnn_tpu simulator params -> reference LearnedSimulator state_dict
    (inverse of import_single_scale; round-trip pinned by test)."""
    epd = "_encode_process_decode"
    out: Dict[str, np.ndarray] = {}
    _mlp_ln_export(f"{epd}._encoder.node_fn", params["epd"]["encoder"]["node"], out)
    _mlp_ln_export(f"{epd}._encoder.edge_fn", params["epd"]["encoder"]["edge"], out)
    for m, block in enumerate(params["epd"]["processor"]):
        _mlp_ln_export(f"{epd}._processor.gnn_stacks.{m}.edge_fn", block["edge"], out)
        _mlp_ln_export(f"{epd}._processor.gnn_stacks.{m}.node_fn", block["node"], out)
    _mlp_export(f"{epd}._decoder.node_fn", params["epd"]["decoder"], out)
    if "type_embedding" in params:
        out["_particle_type_embedding.weight"] = np.asarray(
            params["type_embedding"]["table"]
        )
    return out


def export_multi_scale(params: dict) -> Dict[str, np.ndarray]:
    """sgnn_tpu multi-scale params -> reference MultiScaleSimulator
    state_dict (inverse of import_multi_scale)."""
    g = "_multi_scale_gnn"
    gnn = params["gnn"]
    out: Dict[str, np.ndarray] = {}
    for enc in ("grid_node_encoder", "g2m_edge_encoder", "m2m_edge_encoder",
                "m2g_edge_encoder"):
        _mlp_ln_export(f"{g}.{enc}", gnn[enc], out)

    def block(prefix, b):
        _mlp_ln_export(f"{prefix}.edge_fn", b["edge"], out)
        _mlp_ln_export(f"{prefix}.node_fn", b["node"], out)

    block(f"{g}.g2m_block", gnn["g2m_block"])
    for m, b in enumerate(gnn["m2m_blocks"]):
        block(f"{g}.m2m_blocks.{m}", b)
    block(f"{g}.m2g_block", gnn["m2g_block"])
    _mlp_export(f"{g}.prediction_head", gnn["prediction_head"], out)
    if "type_embedding" in params:
        out["_particle_type_embedding.weight"] = np.asarray(
            params["type_embedding"]["table"]
        )
    return out
