from . import talker, code_predictor, vocoder, speaker_encoder, weights

__all__ = ["talker", "code_predictor", "vocoder", "speaker_encoder", "weights"]
