"""S12/S13: Parquet cache sink, save_to_disk / load_from_disk.

Reference semantics: datasets persist as Arrow cache files plus a state
JSON (arrow_dataset.py:131-138, load.py:268-280, writer
table_util.py:367-435 with tmp-file + atomic move). Spark mapping:
``df.write.parquet`` (Spark's commit protocol is already atomic) plus a
sidecar ``_biosets_state.json`` carrying the role metadata, label
dictionaries, and fingerprint so a reload restores the full typed
dataset.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import roles

STATE_FILE = "_biosets_state.json"


def save_to_disk(
    df: DataFrame,
    path: str,
    fingerprint: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
) -> None:
    """Persist as parquet (+ role sidecar). ``partition_by`` writes a
    hive-style layout (``col=value/`` directories) so downstream scans
    with an equality/range filter on those columns prune whole
    partitions before reading a byte — the 100 TB layout lever for
    date- or split-keyed datasets.
    """
    writer = df.write.mode(mode)
    if partition_by:
        partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    state = {
        "roles": roles.roles_snapshot(df),
        "columns": df.columns,
        "fingerprint": fingerprint,
        "format": "parquet",
        "partition_by": partition_by or [],
        # partition values live in DIRECTORY NAMES, not parquet files;
        # the reader re-infers their types ("1" -> int), so the saved
        # dtypes must be recorded to round-trip the schema faithfully
        "partition_schema": {
            c: df.schema[c].dataType.simpleString() for c in (partition_by or [])
        },
    }
    with open(os.path.join(path, STATE_FILE), "w") as f:
        json.dump(state, f, indent=2)


def load_from_disk(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql.functions import col

    df = spark.read.parquet(path)
    state_path = os.path.join(path, STATE_FILE)
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
        for c, dt in (state.get("partition_schema") or {}).items():
            if c in df.columns and df.schema[c].dataType.simpleString() != dt:
                df = df.withColumn(c, col(c).cast(dt))
        df = roles.apply_roles(df, state.get("roles", {}))
        cols = [c for c in state.get("columns", []) if c in df.columns]
        if cols:
            df = df.select(*cols)
    return df
