from sgnn_tpu.nn.core import (
    linear_init,
    linear_apply,
    mlp_init,
    mlp_apply,
    layer_norm_init,
    layer_norm_apply,
    mlp_ln_init,
    mlp_ln_apply,
    embedding_init,
    embedding_apply,
)

__all__ = [
    "linear_init",
    "linear_apply",
    "mlp_init",
    "mlp_apply",
    "layer_norm_init",
    "layer_norm_apply",
    "mlp_ln_init",
    "mlp_ln_apply",
    "embedding_init",
    "embedding_apply",
]
