from . import audio, dedup, multimodal, similarity, text

__all__ = ["audio", "dedup", "multimodal", "similarity", "text"]
