from .gguf import GGUFReader, GGUFWriter, dequantize, quantize_q8_0

__all__ = ["GGUFReader", "GGUFWriter", "dequantize", "quantize_q8_0"]
