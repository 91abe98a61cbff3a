"""Standalone multi-scale inference driver (reference parity CLI).

Counterpart of sgnn/multi_scale/multi_scale_inference.py:19-127 — a
rollout+save entry point separate from the trainer. Thin wrapper over
the shared predict() implementation:

  python -m sgnn_tpu.train.multi_scale_inference --config CFG --model_file F
"""

from __future__ import annotations

import argparse

from sgnn_tpu.train.config import load_config
from sgnn_tpu.train.train_multi_scale import predict


def main():
    p = argparse.ArgumentParser(description="Multi-scale GNN inference")
    p.add_argument("--config", required=True)
    p.add_argument("--model_file", required=True)
    p.add_argument("--split", choices=["valid", "rollout"], default="rollout")
    args = p.parse_args()
    cfg = load_config(
        args.config, {"mode": args.split, "model_file": args.model_file}
    )
    predict(cfg)


if __name__ == "__main__":
    main()
