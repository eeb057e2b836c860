from . import deck, dedup, multimodal, similarity

__all__ = ["deck", "dedup", "multimodal", "similarity"]
