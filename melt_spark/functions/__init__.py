from . import text, dedup, similarity, multimodal

__all__ = ["text", "dedup", "similarity", "multimodal"]
