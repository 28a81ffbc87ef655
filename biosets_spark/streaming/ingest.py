"""Structured Streaming: file-arrival ingest and windowed/stateful ops.

The reference has no streaming execution (`load_dataset(streaming=
True)` raises NotImplementedError, reference src/biosets/load.py:
135-139; its streaming.py only patches fsspec lazy file opening). The
engine exposes the idiomatic Spark equivalents (SURVEY §1.4/§2.9):

- file-source streaming ingest (the fsspec-lazy-read analogue):
  ``read_stream`` over a directory of csv/json/parquet;
- tumbling/sliding window aggregation with watermarks;
- session windows (``session_window``);
- stateful dedup (``dropDuplicatesWithinWatermark``).

The batch twins of these queries (same semantics over the static
events table) are oracle-checked in queries/ext.py; the streaming
planners here are exercised by tests/test_streaming.py with
Trigger.AvailableNow against a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """File-arrival streaming source (S-ingest). Schema is mandatory
    for streaming sources; defaults to the events schema."""
    reader = spark.readStream.format(fmt).schema(schema or EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) window counts + sums
    with late-data handling via watermark. State size is bounded by
    (windows in watermark horizon) x (key cardinality)."""
    keys = keys if keys is not None else ["event_type"]
    w = F.window(col(ts_col), window, slide) if slide else F.window(col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(col("w.start").alias("window_start"), col("w.end").alias("window_end"), *keys, "n", "total_value")
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into
    one session per key (the streaming twin of the gaps-and-islands
    batch query q_events_sessions)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(col(ts_col), gap).alias("s"), col(key))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(col(key), col("s.start").alias("session_start"), col("s.end").alias("session_end"),
                "n_events", "total_value")
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming dedup: duplicates within the watermark
    horizon are dropped; state self-expires (bounded memory at scale)."""
    keys = keys if keys is not None else ["user_id", "event_type"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    within: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join on ``key`` with an event-time interval
    condition: right rows match left rows at most ``within`` later.

    Both sides carry watermarks, so the join state for a key/time range
    is dropped once the watermark passes — bounded state regardless of
    stream length (the requirement for an unbounded 100 TB/day join).
    The batch twin of this shape is q_asof_join / q_events_funnel.
    """
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (col(f"l.{key}") == col(f"r.{key}"))
        & (col(f"r.{ts_col}") >= col(f"l.{ts_col}"))
        & (col(f"r.{ts_col}") <= col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").select(
        col(f"l.{key}").alias(key),
        col(f"l.{ts_col}").alias("left_ts"),
        col(f"r.{ts_col}").alias("right_ts"),
        col("l.event_id").alias("left_event_id"),
        col("r.event_id").alias("right_event_id"),
    )


def run_available_now(stream_df: DataFrame, query_name: str, output_mode: str = "append") -> list:
    """Drain a stream with Trigger.AvailableNow into a memory sink and
    return the rows (test/debug helper). Use output_mode="complete"
    for aggregated streams."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()


def incremental_dedup_sink(
    stream_df: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key_cols: list[str] | None = None,
    fingerprint_col: str = "_fp",
):
    """foreachBatch incremental-dedup sink: the production shape of
    the batch q_incremental_dedup query. Each micro-batch is
    fingerprinted (md5 over the key columns), deduped within the
    batch, anti-joined against the accumulated parquet store, and the
    survivors appended. The store only ever grows by never-seen rows,
    so replaying a feed (or overlapping file drops) is idempotent at
    the row level.

    Scale: the anti-join is fingerprint-against-fingerprint — the
    store side can be column-pruned to ``fingerprint_col`` only, so
    state per batch is one string column of the corpus, not the
    corpus. On a real cluster the store would be a partitioned table
    (or Delta/Iceberg with a MERGE); plain parquet append keeps the
    same plan shape without a table format dependency. Exactly-once
    caveat: parquet append is not transactional, so a crash between
    the write and the checkpoint commit can duplicate a batch —
    acceptable for dedup (re-appended rows are filtered on the next
    batch's anti-join read... only new duplicates within the crashed
    batch window survive); a table format closes even that.

    Returns the StreamingQuery (caller awaits termination).
    """
    from pyspark.sql.utils import AnalysisException

    keys = key_cols or [c for c in stream_df.columns]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fp = F.md5(F.concat_ws("\x1f", *[F.coalesce(col(k).cast("string"), F.lit("")) for k in keys]))
        batch = batch_df.withColumn(fingerprint_col, fp).dropDuplicates([fingerprint_col])
        try:
            seen = spark.read.parquet(store_path).select(fingerprint_col)
        except AnalysisException:
            seen = None
        fresh = batch if seen is None else batch.join(seen, fingerprint_col, "left_anti")
        fresh.write.mode("append").parquet(store_path)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def cdc_upsert_sink(
    stream_df: DataFrame,
    store_path: str,
    checkpoint_path: str,
    keys: list[str] | str,
    order_col: str,
):
    """foreachBatch CDC upsert sink: the streaming twin of
    ``sources.sink.upsert_parquet``. Each micro-batch is first
    collapsed to the LATEST record per key (row_number over
    ``order_col`` descending, deterministic — a change feed can carry
    several updates for one key in one batch), then MERGEd into the
    parquet store: superseded base rows dropped via anti-join, the
    batch's winners unioned in, atomic directory swap.

    Guarded against out-of-order feeds: a batch row older than the
    stored version (store's ``order_col`` >= batch's) is discarded, so
    replays and late-arriving updates never roll a key backwards.
    Combined with checkpointed source offsets this makes the sink
    idempotent at the key level — the exactly-once caveat of
    ``incremental_dedup_sink`` (non-transactional parquet swap vs
    checkpoint commit) applies identically and is closed by a table
    format's MERGE at production scale.

    Returns the StreamingQuery (caller awaits termination).
    """
    from pyspark.sql import Window
    from pyspark.sql.utils import AnalysisException

    from ..sources.sink import upsert_parquet

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(*key_list).orderBy(col(order_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(col("_rn") == 1)
            .drop("_rn")
        )
        try:
            base = spark.read.parquet(store_path)
        except AnalysisException:
            base = None
        if base is not None:
            stored = base.select(
                *key_list, col(order_col).alias("_stored_ord")
            )
            latest = (
                latest.join(stored, key_list, "left")
                .filter(
                    col("_stored_ord").isNull()
                    | (col(order_col) > col("_stored_ord"))
                )
                .drop("_stored_ord")
            )
        if latest.isEmpty():
            return
        upsert_parquet(spark, store_path, latest, key_list)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def merge_stream_sink(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    on: list[str] | str,
    order_col: str,
    matched_update=None,
    matched_delete=None,
    not_matched_insert=None,
    matched_condition=None,
    allow_schema_evolution: bool = False,
):
    """foreachBatch MERGE sink into a VERSIONED table (r8): the
    streaming twin of ``sources.sink.merge_into_parquet``, applying
    the three-clause MERGE (matched-update / matched-delete /
    not-matched-insert — ``operators.merge.merge_into`` semantics) to
    each micro-batch and committing one table version per non-empty
    batch.

    Exactly-once, genuinely: each commit carries the micro-batch id
    as an idempotency token in the table's commit log, so a batch
    replayed after a crash between the snapshot commit and the
    checkpoint write is detected and skipped — the gap
    ``incremental_dedup_sink``/``cdc_upsert_sink`` document as the
    non-transactional-parquet caveat is CLOSED here by the versioned
    table's atomic log append. Within a batch, rows are first
    collapsed to the latest per key by ``order_col`` (merge_into
    rejects duplicate source keys, as SQL MERGE does).

    Returns the StreamingQuery (caller awaits termination).
    """
    from pyspark.sql import Window

    from ..sources.sink import merge_into_parquet

    key_list = [on] if isinstance(on, str) else list(on)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*key_list).orderBy(col(order_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(col("_rn") == 1)
            .drop("_rn")
        )
        if latest.isEmpty():
            return
        merge_into_parquet(
            batch_df.sparkSession, table_path, latest, key_list,
            matched_update=matched_update,
            matched_delete=matched_delete,
            not_matched_insert=not_matched_insert,
            matched_condition=matched_condition,
            idempotency_token=f"batch-{batch_id}",
            allow_schema_evolution=allow_schema_evolution,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
