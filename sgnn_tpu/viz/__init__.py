from sgnn_tpu.viz.render_rollout import render_rollout_file, render_rollout_dict

__all__ = ["render_rollout_file", "render_rollout_dict"]
