from . import (
    asof,
    cluster,
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
    "asof", "cluster", "concat", "dedup", "events", "graph", "joins", "labels",
    "merge", "multimodal", "pii", "pipeline", "ranking", "similarity", "skew",
    "split", "text",
]
