from .layers import rms_norm, rope_neox, swiglu, gqa_attention_prefill, gqa_attention_step

__all__ = [
    "rms_norm",
    "rope_neox",
    "swiglu",
    "gqa_attention_prefill",
    "gqa_attention_step",
]
