from sgnn_tpu.models.encode_process_decode import (
    EPDConfig,
    encode_process_decode_init,
    encode_process_decode_apply,
    interaction_network_init,
    interaction_network_apply,
)

__all__ = [
    "EPDConfig",
    "encode_process_decode_init",
    "encode_process_decode_apply",
    "interaction_network_init",
    "interaction_network_apply",
]
