"""`biosets_table`: the versioned table as a first-class Spark data
source (Python Data Source API, Spark 4).

Batch:
    spark.dataSource.register(BiosetsTableDataSource)
    spark.read.format("biosets_table").option("version", 2).load(path)
    # time travel via option("version", N) or option("asOf", iso_ts);
    # default = current version

Streaming (change-data-feed consumption):
    spark.readStream.format("biosets_table")
         .option("readChangeFeed", "true")
         .option("startingVersion", 0)   # default: current (new commits only)
         .load(path)
    # emits each commit's persisted _changes/v00000N rows exactly once,
    # offsets = table versions (the commit log IS the offset log)

Design: readers never recompute anything — the batch reader's
partitions are the snapshot's parquet files (one task per file,
pyarrow RecordBatch iteration, zero driver collection), and the
streaming reader's partitions are the change-feed files of each newly
committed version (commits made with ``write_change_feed``; versions
without a feed — e.g. 'compact', which is a physical rewrite with no
logical change — are skipped). Offsets are JSON dicts
``{"version": N}`` meaning "consumed through version N", so a restart
resumes from the checkpointed version exactly like any Spark source.

No reference counterpart (the reference has no table format or
streaming); modeled on the public Delta CDF reader semantics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .sink import SNAPSHOT_DIR, TABLE_LOG, _changes_path, _snapshot_path


def _log(path: str) -> dict:
    log_path = os.path.join(path, TABLE_LOG)
    if not os.path.exists(log_path):
        raise FileNotFoundError(
            f"no versioned table at {path!r} (create_table first)")
    with open(log_path) as f:
        return json.load(f)


def _parquet_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))


def _spark_schema_of(parquet_dir: str) -> StructType:
    """Footer-only schema read (driver-side, one file) via pyarrow —
    the data source plans without a SparkSession."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_schema

    files = _parquet_files(parquet_dir)
    if not files:
        raise ValueError(f"no parquet files under {parquet_dir!r}")
    return from_arrow_schema(pq.read_schema(files[0]))


@dataclass
class _FilesPartition(InputPartition):
    files: list[str]


def _read_files_arrow(files: list[str], target_schema=None):
    """Yield RecordBatches, reconciled to ``target_schema`` (a pyarrow
    schema) when given: columns the file lacks come back as nulls and
    column order matches the declaration — this is what lets a CDF
    stream whose later commits evolved the schema (merge
    allow_schema_evolution) keep reading the narrower early feeds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in files:
        pf = pq.ParquetFile(f)
        for batch in pf.iter_batches():
            if target_schema is None or batch.schema.equals(target_schema):
                yield batch
                continue
            cols = []
            for fld in target_schema:
                idx = batch.schema.get_field_index(fld.name)
                if idx >= 0:
                    cols.append(batch.column(idx).cast(fld.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, type=fld.type))
            yield pa.RecordBatch.from_arrays(cols, schema=target_schema)


class _SnapshotReader(DataSourceReader):
    def __init__(self, snapshot_dir: str, table_path: str | None = None,
                 version: int | None = None,
                 skip_filters: list | None = None):
        self.snapshot_dir = snapshot_dir
        self.table_path = table_path
        self.version = version
        self.skip_filters = skip_filters

    def partitions(self):
        # one task per part-file: the same parallelism a native
        # parquet scan of the snapshot would get
        files = _parquet_files(self.snapshot_dir)
        if self.skip_filters:
            # file-level data skipping via the _stats/ footer index
            # (sink.prune_snapshot_files). The option is a COARSE
            # pre-filter: kept files may still contain non-matching
            # rows, so the caller composes the same predicate with
            # .filter(...) — identical contract to partition pruning.
            from .sink import prune_snapshot_files

            kept, _total = prune_snapshot_files(
                self.table_path, self.version,
                [tuple(f) for f in self.skip_filters])
            keep = {os.path.basename(k) for k in kept}
            files = [f for f in files if os.path.basename(f) in keep]
        # a fully-pruned scan still needs one (empty) partition — some
        # plan shapes reject a zero-partition relation
        return [_FilesPartition([f]) for f in files] or [_FilesPartition([])]

    def read(self, partition):
        yield from _read_files_arrow(partition.files)


class _ChangeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, starting_version: int | None,
                 arrow_schema=None):
        self.path = path
        self.starting_version = starting_version
        self.arrow_schema = arrow_schema

    def initialOffset(self) -> dict:
        # offset = "consumed THROUGH version N": starting_version=K
        # replays history from commit K; default skips history and
        # emits only commits made after the stream started
        if self.starting_version is not None:
            return {"version": self.starting_version - 1}
        return {"version": _log(self.path)["current"]}

    def latestOffset(self) -> dict:
        return {"version": _log(self.path)["current"]}

    def partitions(self, start: dict, end: dict):
        log = _log(self.path)
        by_v = {v["version"]: v for v in log["versions"]}
        parts = []
        for ver in range(start["version"] + 1, end["version"] + 1):
            entry = by_v.get(ver)
            if entry is None or not entry.get("change_feed"):
                # compact/no-feed commits carry no logical changes to emit
                continue
            files = _parquet_files(_changes_path(self.path, ver))
            if files:
                parts.append(_FilesPartition(files))
        return parts

    def read(self, partition):
        yield from _read_files_arrow(partition.files, self.arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # retention is vacuum_table's job, not the reader's

    def stop(self) -> None:
        pass


class BiosetsTableDataSource(DataSource):
    """spark.read / spark.readStream format for the versioned table."""

    @classmethod
    def name(cls) -> str:
        return "biosets_table"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "biosets_table requires a path: .load('/path/to/table')")
        return p

    def _resolved_version(self) -> int:
        log = _log(self._path())
        if "version" in self.options and "asof" in {k.lower() for k in self.options}:
            raise ValueError("pass version OR asOf, not both")
        if "version" in self.options:
            ver = int(self.options["version"])
        else:
            as_of = next((v for k, v in self.options.items()
                          if k.lower() == "asof"), None)
            if as_of is not None:
                eligible = [v for v in log["versions"]
                            if v["timestamp"] <= as_of]
                if not eligible:
                    raise ValueError(
                        f"no snapshot at or before {as_of!r}")
                ver = eligible[-1]["version"]
            else:
                ver = log["current"]
        entry = {v["version"]: v for v in log["versions"]}.get(ver)
        if entry is None:
            raise ValueError(f"version {ver} not in table log")
        if entry.get("vacuumed"):
            raise ValueError(f"version {ver} was vacuumed")
        return ver

    def _read_cdf(self) -> bool:
        return self.options.get("readchangefeed", self.options.get(
            "readChangeFeed", "false")).lower() == "true"

    def schema(self) -> StructType:
        path = self._path()
        if self._read_cdf():
            log = _log(path)
            fed = [v for v in log["versions"] if v.get("change_feed")]
            if not fed:
                raise ValueError(
                    f"table {path!r} has no change feed — commit with "
                    "write_change_feed=True to stream it")
            # the WIDEST feed schema — schema evolution only appends
            # columns, so the latest fed commit declares the superset;
            # narrower early feeds are null-padded at read
            return _spark_schema_of(_changes_path(path, fed[-1]["version"]))
        return _spark_schema_of(_snapshot_path(path, self._resolved_version()))

    def reader(self, schema: StructType) -> DataSourceReader:
        if self._read_cdf():
            raise ValueError(
                "batch change-feed reads go through "
                "sources.sink.read_change_feed; the biosets_table batch "
                "format reads snapshots")
        sf = next((v for k, v in self.options.items()
                   if k.lower() == "skipfilters"), None)
        ver = self._resolved_version()
        return _SnapshotReader(
            _snapshot_path(self._path(), ver),
            table_path=self._path(), version=ver,
            # JSON list of [column, op, value] conjuncts, e.g.
            # .option("skipFilters", '[["k", ">=", 100]]') — values are
            # JSON scalars (numbers/strings); see sink.read_snapshot_where
            # for the Python-native API with date/decimal support
            skip_filters=json.loads(sf) if sf else None)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if not self._read_cdf():
            raise ValueError(
                "streaming a biosets_table requires "
                "option('readChangeFeed', 'true') — a snapshot is a "
                "static batch, the CHANGE FEED is the stream")
        sv = next((v for k, v in self.options.items()
                   if k.lower() == "startingversion"), None)
        from pyspark.sql.pandas.types import to_arrow_schema

        return _ChangeFeedStreamReader(
            self._path(), int(sv) if sv is not None else None,
            arrow_schema=to_arrow_schema(schema))


def register(spark) -> None:
    """Register the format on a session:
    ``spark.read.format('biosets_table')...``."""
    spark.dataSource.register(BiosetsTableDataSource)
