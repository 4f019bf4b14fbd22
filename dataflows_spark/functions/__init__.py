from . import audio, dedup, multimodal, sampling, similarity, text

__all__ = ["audio", "dedup", "multimodal", "sampling", "similarity", "text"]
