"""biosets_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of psmyth94/biosets (reference studied at
/root/reference), re-architected Spark-first.

Layers (SURVEY.md §7.0):
- sources/   readers + path planning + Parquet sink
- schema/    physical type lattice + semantic role metadata
- operators/ joins, concat, labels, splits, dedup, similarity, text
- functions/ scalar/vector expression helpers
- plans/     plan-fingerprint cache
- streaming/ Structured Streaming ingest + windowed/stateful ops
"""

from .dataset import BioDataset, BioDatasetDict
from .load import ReadInstruction, load_dataset
from .session import get_spark
from .sources.sink import load_from_disk, save_to_disk


def concatenate_datasets(dsets: list, axis: int = 0) -> "BioDataset":
    """Reference-parity top-level concat (datasets.concatenate_datasets):
    axis 0 unions rows through the type-promotion lattice, axis 1 zips
    columns positionally (first-wins on duplicate names). Accepts
    BioDataset or DataFrame items."""
    from .operators.concat import concat as _concat

    frames = [d.df if isinstance(d, BioDataset) else d for d in dsets]
    split = next((d.split for d in dsets if isinstance(d, BioDataset)), "train")
    return BioDataset(_concat(frames, axis=axis), split=split)


__version__ = "0.1.0"

__all__ = [
    "BioDataset", "BioDatasetDict", "load_dataset", "ReadInstruction", "get_spark", "save_to_disk",
    "load_from_disk", "concatenate_datasets",
]
