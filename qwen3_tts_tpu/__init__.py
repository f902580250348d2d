"""qwen3-tts-tpu: TPU-native (JAX/XLA/Pallas) inference stack for
Qwen3-TTS-12Hz (text -> 24 kHz speech with voice cloning).

A ground-up rebuild of the capabilities of the C++ GGML+TensorRT reference
(`qwen3-tts-jetson`), redesigned around TPU idioms: jitted batched
functional models, fused lax.scan autoregression, on-device sampling, and
jax.sharding for multi-chip scale-out.
"""

__version__ = "0.1.0"

from .config import (
    TalkerConfig,
    VocoderConfig,
    SpeakerEncoderConfig,
    TokenizerSpecialTokens,
)
from .tokenizer import TextTokenizer

__all__ = [
    "TalkerConfig",
    "VocoderConfig",
    "SpeakerEncoderConfig",
    "TokenizerSpecialTokens",
    "TextTokenizer",
]
