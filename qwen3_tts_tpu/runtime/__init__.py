from . import generate, pipeline, audio_io

__all__ = ["generate", "pipeline", "audio_io"]
