from . import concat, dedup, joins, labels, multimodal, similarity, split, text

__all__ = ["concat", "dedup", "joins", "labels", "multimodal", "similarity", "split", "text"]
