"""The `biosets_table` Python data source (r8): batch snapshot reads
with time travel, and streaming change-data-feed consumption with
checkpointed version offsets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from biosets_spark.sources import sink, table_source


@pytest.fixture()
def table(spark, tmp_path):
    table_source.register(spark)
    path = str(tmp_path / "tbl")
    sink.create_table(
        spark, path,
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, price double"),
        write_change_feed=True)
    sink.merge_into_parquet(
        spark, path,
        spark.createDataFrame([(2, "U", 99.0), (9, "I", 5.0)],
                              "k long, op string, new_price double"),
        on="k", matched_update={"price": col("__s.new_price")},
        matched_condition=col("__s.op") == "U",
        not_matched_insert={"price": col("__s.new_price")})
    return path


def test_batch_read_current_and_time_travel(spark, table):
    cur = spark.read.format("biosets_table").load(table)
    assert sorted((r.k, r.price) for r in cur.collect()) == \
        [(1, 10.0), (2, 99.0), (9, 5.0)]
    v0 = spark.read.format("biosets_table").option("version", 0).load(table)
    assert sorted((r.k, r.price) for r in v0.collect()) == \
        [(1, 10.0), (2, 20.0)]
    ts = sink.table_history(table)[0]["timestamp"]
    as_of = spark.read.format("biosets_table").option("asOf", ts).load(table)
    assert as_of.count() == 2
    with pytest.raises(Exception, match="not in table log"):
        spark.read.format("biosets_table").option("version", 9).load(
            table).collect()


def test_stream_cdf_from_version_zero(spark, table):
    q = (spark.readStream.format("biosets_table")
         .option("readChangeFeed", "true").option("startingVersion", 0)
         .load(table)
         .writeStream.format("memory").queryName("cdf_all")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM cdf_all").collect()
    assert sorted((r.k, r._change_type) for r in rows) == [
        (1, "insert"), (2, "insert"), (2, "update_postimage"),
        (2, "update_preimage"), (9, "insert"),
    ]


def test_stream_cdf_incremental_resume(spark, table, tmp_path):
    """Checkpointed offsets: a second drain with the SAME checkpoint
    emits only commits made after the first drain."""
    ckpt = str(tmp_path / "ckpt")
    sk = str(tmp_path / "sink_out")

    def drain():
        q = (spark.readStream.format("biosets_table")
             .option("readChangeFeed", "true").option("startingVersion", 0)
             .load(table)
             .writeStream.format("parquet").option("path", sk)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sk).count() == 5  # v0 inserts + v1 changes
    # commit v2 (delete key 1), drain again with the same checkpoint
    sink.merge_into_parquet(
        spark, table,
        spark.createDataFrame([(1, "D", 0.0)],
                              "k long, op string, new_price double"),
        on="k", matched_delete=col("__s.op") == "D")
    drain()
    out = spark.read.parquet(sk)
    assert out.count() == 6  # exactly ONE new row
    assert [(r.k, r._change_type) for r in
            out.where("_change_type = 'delete'").collect()] == [(1, "delete")]


def test_stream_requires_feed_and_flag(spark, tmp_path):
    table_source.register(spark)
    path = str(tmp_path / "nofeed")
    sink.create_table(spark, path, spark.createDataFrame(
        [(1, 1.0)], "k long, price double"))  # no feed
    with pytest.raises(Exception, match="no change feed"):
        (spark.readStream.format("biosets_table")
         .option("readChangeFeed", "true").load(path))
    with pytest.raises(Exception, match="readChangeFeed"):
        q = (spark.readStream.format("biosets_table").load(path)
             .writeStream.format("memory").queryName("x")
             .trigger(availableNow=True).start())
        q.awaitTermination()  # streamReader error surfaces on the query


def test_compact_version_skipped_by_stream(spark, table, tmp_path):
    """A compact commit is a physical rewrite with no logical change;
    the CDF stream must skip it rather than fail or duplicate."""
    sink.compact_table(spark, table, target_rows_per_file=100)
    q = (spark.readStream.format("biosets_table")
         .option("readChangeFeed", "true").option("startingVersion", 0)
         .load(table)
         .writeStream.format("memory").queryName("cdf_skip")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.sql("SELECT count(*) n FROM cdf_skip").collect()[0].n == 5


def test_stream_cdf_across_schema_evolution(spark, table):
    """An evolved commit widens the feed schema; the stream declares
    the widest schema and null-pads the narrower early feeds, and the
    batch read_change_feed unions across the evolution."""
    sink.merge_into_parquet(
        spark, table,
        spark.createDataFrame([(9, "eu", 7.0)],
                              "k long, region string, new_price double"),
        on="k",
        matched_update={"price": col("__s.new_price"),
                        "region": col("__s.region")},
        allow_schema_evolution=True)
    q = (spark.readStream.format("biosets_table")
         .option("readChangeFeed", "true").option("startingVersion", 0)
         .load(table)
         .writeStream.format("memory").queryName("cdf_evo")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM cdf_evo").collect()
    assert "region" in rows[0].asDict()
    by = {(r.k, r._change_type): r.region for r in rows}
    assert by[(9, "update_postimage")] == "eu"
    assert by[(1, "insert")] is None  # null-padded early feed
    assert len(rows) == 7  # 3 inserts + 2x2 update images
    # batch feed reader tolerates the widened schema too
    feed = sink.read_change_feed(spark, table, 0)
    assert feed.count() == 7 and "region" in feed.columns


def test_medallion_cdf_to_merge_pipeline(spark, table, tmp_path):
    """End-to-end composition: stream table A's change feed (bronze)
    and MERGE it into table B (silver) via the exactly-once streaming
    sink — the medallion pipeline shape, entirely on engine
    primitives. Deletes propagate; replays are no-ops."""
    from biosets_spark.streaming import ingest as SI

    silver = str(tmp_path / "silver")
    sink.create_table(spark, silver, spark.createDataFrame(
        [], "k long, price double"))

    def sync(ckpt):
        feed = (spark.readStream.format("biosets_table")
                .option("readChangeFeed", "true")
                .option("startingVersion", 0).load(table))
        # post-images + inserts apply; deletes propagate as deletes;
        # the per-key collapse orders on _commit_version (stamped into
        # every feed row at commit time), so the newest commit wins
        relevant = feed.where(
            "_change_type in ('insert', 'update_postimage', 'delete')")
        q = SI.merge_stream_sink(
            relevant, silver, str(tmp_path / ckpt),
            on="k", order_col="_commit_version",  # rides in the feed
            matched_update={"price": col("__s.price")},
            matched_delete=col("__s._change_type") == "delete",
            matched_condition=col("__s._change_type") != "delete",
            not_matched_insert={"price": col("__s.price")},
        )
        q.awaitTermination()

    sync("ck1")
    got = {r.k: r.price for r in sink.read_snapshot(spark, silver).collect()}
    assert got == {1: 10.0, 2: 99.0, 9: 5.0}  # bronze current state
    # bronze delete propagates on the next incremental sync
    sink.merge_into_parquet(
        spark, table,
        spark.createDataFrame([(1, "D", 0.0)],
                              "k long, op string, new_price double"),
        on="k", matched_delete=col("__s.op") == "D")
    sync("ck1")  # same checkpoint: only the new bronze commit flows
    got = {r.k: r.price for r in sink.read_snapshot(spark, silver).collect()}
    assert got == {2: 99.0, 9: 5.0}
