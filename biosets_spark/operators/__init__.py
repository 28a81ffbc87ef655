from . import asof, concat, dedup, graph, joins, labels, multimodal, similarity, skew, split, text

__all__ = [
    "asof", "concat", "dedup", "graph", "joins", "labels", "multimodal",
    "similarity", "skew", "split", "text",
]
