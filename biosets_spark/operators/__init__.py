from . import (
    asof,
    concat,
    dedup,
    events,
    graph,
    joins,
    labels,
    merge,
    multimodal,
    pii,
    pipeline,
    ranking,
    similarity,
    skew,
    split,
    text,
)

__all__ = [
    "asof", "concat", "dedup", "events", "graph", "joins", "labels",
    "merge", "multimodal", "pii", "pipeline", "ranking", "similarity", "skew",
    "split", "text",
]
