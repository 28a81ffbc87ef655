"""Structured Streaming: file-source ingest, windowed aggs, session
windows, stateful dedup — drained with Trigger.AvailableNow."""

import datetime as dt

import pytest

from biosets_spark.streaming import ingest as SI


@pytest.fixture()
def events_dir(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2):
        for burst in range(2):  # two sessions per user, 2h apart
            for i in range(3):
                ts = base + dt.timedelta(hours=2 * burst, minutes=i)
                rows.append((eid, ts, user, "click", 1.0, "{}"))
                eid += 1
    # duplicate event for dedup testing
    rows.append((0, base, 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(rows, SI.EVENTS_SCHEMA)
    p = str(tmp_path / "events_stream")
    df.coalesce(1).write.parquet(p)
    return p


def test_read_stream_is_streaming(spark, events_dir):
    sdf = SI.read_stream(spark, events_dir)
    assert sdf.isStreaming


def test_windowed_counts_stream(spark, events_dir):
    sdf = SI.read_stream(spark, events_dir)
    agg = SI.windowed_counts(sdf, window="1 hour", watermark="4 hours")
    rows = SI.run_available_now(agg, "win_counts", output_mode="complete")
    got = {(r.window_start.hour, r.event_type): r.n for r in rows}
    # two users x 3 events in hour 0 and hour 2
    assert got[(0, "click")] == 7  # includes the duplicate
    assert got[(2, "click")] == 6


def test_sessionized_stream(spark, events_dir):
    sdf = SI.read_stream(spark, events_dir)
    sess = SI.sessionized(sdf, gap="30 minutes", watermark="4 hours")
    rows = SI.run_available_now(sess, "sessions", output_mode="complete")
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, 0)
        per_user[r.user_id] += 1
    assert per_user == {1: 2, 2: 2}  # two sessions each


def test_dedup_within_watermark_stream(spark, events_dir):
    sdf = SI.read_stream(spark, events_dir)
    dd = SI.dedup_within_watermark(sdf, keys=["event_id"], watermark="4 hours")
    rows = SI.run_available_now(dd, "dedup", output_mode="append")
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)) == 12  # 13 raw - 1 duplicate


def test_stateful_running_stats(spark, events_dir):
    from biosets_spark.streaming.stateful import running_user_stats

    sdf = SI.read_stream(spark, events_dir)
    stats = running_user_stats(sdf)
    rows = SI.run_available_now(stats, "user_stats", output_mode="update")
    # final state per user: 6 events each (+1 duplicate for user 1)
    final = {}
    for r in rows:  # update mode may emit per micro-batch; last wins
        final[r.user_id] = (r.n_events, r.total_value)
    assert final[1] == (7, 7.0)
    assert final[2] == (6, 6.0)


class _FakeGroupState:
    """Minimal GroupState double for unit-testing the update fn contract."""

    def __init__(self, value=None, has_timed_out=False):
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_stateful_timeout_evicts_idle_key():
    """When ProcessingTimeTimeout fires, the key must be evicted: no
    state re-update, no timeout re-arm, no spurious output row."""
    import pandas as pd

    from biosets_spark.streaming.stateful import _make_update

    fn = _make_update(timeout_ms=1000)
    state = _FakeGroupState(value=(5, 5.0), has_timed_out=True)
    out = list(fn((1,), iter([]), state))
    assert out == []  # no duplicate emission on the sweep
    assert state.removed  # idle key evicted
    assert state.timeout_set is None  # timeout not re-armed


def test_stateful_update_path_arms_timeout():
    import pandas as pd

    from biosets_spark.streaming.stateful import _make_update

    fn = _make_update(timeout_ms=1000)
    state = _FakeGroupState(value=(2, 2.0))
    pdf = pd.DataFrame({"value": [1.0, 3.0]})
    out = list(fn((7,), iter([pdf]), state))
    assert len(out) == 1
    assert out[0]["n_events"].iloc[0] == 4
    assert out[0]["total_value"].iloc[0] == 6.0
    assert state.get == (4, 6.0)
    assert state.timeout_set == 1000


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases join to the same user's clicks within the preceding
    hour; watermarks on both sides bound the join state."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 7, "click", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=30), 7, "purchase", 9.0, "{}"),
        (4, base + dt.timedelta(hours=3), 7, "purchase", 5.0, "{}"),  # no click within 1h
        (5, base, 8, "click", 1.0, "{}"),  # other user, no purchase
    ]
    p = str(tmp_path / "ss_events")
    spark.createDataFrame(rows, SI.EVENTS_SCHEMA).coalesce(1).write.parquet(p)

    clicks = SI.read_stream(spark, p).filter("event_type = 'click'")
    purchases = SI.read_stream(spark, p).filter("event_type = 'purchase'")
    joined = SI.stream_stream_join(clicks, purchases, within="1 hour")
    out = SI.run_available_now(joined, "ss_join", output_mode="append")
    pairs = sorted((r.left_event_id, r.right_event_id) for r in out)
    assert pairs == [(1, 3), (2, 3)]


def test_file_sink_with_checkpoint_resumes(spark, tmp_path):
    """writeStream to parquet with a checkpointLocation: draining twice
    over the same input produces each row exactly once (offset tracking
    survives query restarts — the exactly-once file-sink contract)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}") for i in range(5)]
    spark.createDataFrame(rows1, SI.EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            SI.read_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 5
    # restart with more input: only the new file is processed
    rows2 = [(i, base + dt.timedelta(minutes=i), 2, "click", 1.0, "{}") for i in range(5, 8)]
    spark.createDataFrame(rows2, SI.EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 8
    assert got.select("event_id").distinct().count() == 8


def test_incremental_dedup_sink(spark, tmp_path):
    """foreachBatch incremental dedup: two overlapping file drops; the
    store ends up with each distinct row exactly once, and replaying
    the second drop appends nothing new."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")

    def mk(ids):
        return [(i, base + dt.timedelta(minutes=i), i % 3, "click", 1.0, "{}")
                for i in ids]

    spark.createDataFrame(mk([1, 2, 3]), SI.EVENTS_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)

    def drain(ckpt):
        stream = SI.read_stream(spark, src)
        q = SI.incremental_dedup_sink(
            stream, store, str(tmp_path / ckpt), key_cols=["event_id"])
        q.awaitTermination()

    drain("ckpt1")
    assert spark.read.parquet(store).count() == 3

    # second drop overlaps {2,3}; only {4,5} are new
    spark.createDataFrame(mk([2, 3, 4, 5]), SI.EVENTS_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    drain("ckpt2")  # fresh checkpoint: replays ALL files -> anti-join filters
    got = sorted(r.event_id for r in spark.read.parquet(store).collect())
    assert got == [1, 2, 3, 4, 5]


def test_load_dataset_streaming(spark, tmp_path):
    """load_dataset(streaming=True) — NotImplementedError in the
    reference — returns a live file-arrival stream: schema pinned from
    the existing files, later drops ingested on the next drain."""
    from biosets_spark import load_dataset

    d = tmp_path / "stream_src"
    d.mkdir()
    (d / "part1.csv").write_text("sample,v\ns1,1\ns2,2\n")
    stream = load_dataset(path=str(d), streaming=True, spark=spark)
    assert stream.isStreaming
    out = SI.run_available_now(stream, "ld_stream1")
    assert sorted((r.sample, r.v) for r in out) == [("s1", 1), ("s2", 2)]

    (d / "part2.csv").write_text("sample,v\ns3,3\n")
    out2 = SI.run_available_now(stream, "ld_stream2")
    assert len(out2) == 3


def test_cdc_upsert_sink(spark, tmp_path):
    """foreachBatch CDC upsert: a change feed with repeated keys in
    one batch, cross-batch updates, and an out-of-order stale replay.
    The store always holds exactly one (latest) row per key."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "cdc_src")
    store = str(tmp_path / "cdc_store")

    def row(key, minute, value):
        return (key, base + dt.timedelta(minutes=minute), key % 3,
                "update", value, "{}")

    def drain(ckpt):
        stream = SI.read_stream(spark, src)
        q = SI.cdc_upsert_sink(
            stream, store, str(tmp_path / ckpt),
            keys=["event_id"], order_col="ts")
        q.awaitTermination()

    # batch 1: key 1 appears twice -> within-batch latest (minute 5) wins
    spark.createDataFrame(
        [row(1, 1, 10.0), row(1, 5, 11.0), row(2, 2, 20.0)],
        SI.EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    drain("cdc_ckpt1")
    got = {r.event_id: (r.ts, r.value) for r in spark.read.parquet(store).collect()}
    assert set(got) == {1, 2}
    assert got[1] == (base + dt.timedelta(minutes=5), 11.0)

    # batch 2: newer update for key 2, STALE update for key 1 (minute 3
    # < stored minute 5 -> discarded), new key 3
    spark.createDataFrame(
        [row(2, 9, 21.0), row(1, 3, 9.0), row(3, 4, 30.0)],
        SI.EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    drain("cdc_ckpt2")  # fresh checkpoint replays all files; guards hold
    got = {r.event_id: (r.ts, r.value) for r in spark.read.parquet(store).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (base + dt.timedelta(minutes=5), 11.0)  # stale discarded
    assert got[2] == (base + dt.timedelta(minutes=9), 21.0)  # updated
    assert got[3] == (base + dt.timedelta(minutes=4), 30.0)  # inserted
    assert spark.read.parquet(store).count() == 3


def test_merge_stream_sink_versions_and_idempotency(spark, tmp_path):
    """r8: foreachBatch MERGE into a versioned table — one commit per
    non-empty micro-batch, three-clause semantics, and exactly-once
    across replays via the idempotency token in the commit log."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from biosets_spark.sources import sink as SK

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "merge_src")
    tbl = str(tmp_path / "merge_tbl")

    SK.create_table(spark, tbl, spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "event_id long, value double"))

    def row(key, minute, etype, value):
        return (key, base + dt.timedelta(minutes=minute), key % 3,
                etype, value, "{}")

    # one batch: update key 2 (two versions in-batch, latest wins),
    # delete key 1, insert key 7
    spark.createDataFrame(
        [row(2, 1, "update", 98.0), row(2, 6, "update", 99.0),
         row(1, 2, "delete", 0.0), row(7, 3, "update", 70.0)],
        SI.EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    def drain(ckpt):
        q = SI.merge_stream_sink(
            SI.read_stream(spark, src), tbl, str(tmp_path / ckpt),
            on="event_id", order_col="ts",
            matched_update={"value": col("__s.value")},
            matched_delete=col("__s.event_type") == "delete",
            matched_condition=col("__s.event_type") == "update",
            not_matched_insert={"value": col("__s.value")},
        )
        q.awaitTermination()

    drain("ckpt1")
    got = {r.event_id: r.value
           for r in SK.read_snapshot(spark, tbl).collect()}
    assert got == {2: 99.0, 7: 70.0}  # 1 deleted, 2 updated, 7 inserted
    hist = SK.table_history(tbl)
    assert [h["operation"] for h in hist] == ["create", "merge"]
    assert hist[-1]["idempotency_token"] == "batch-0"

    # crash-replay simulation: a fresh checkpoint re-delivers batch 0;
    # the token makes the re-application a no-op (no new version, no
    # double-delete/re-insert)
    drain("ckpt2")
    assert len(SK.table_history(tbl)) == 2
    assert {r.event_id: r.value
            for r in SK.read_snapshot(spark, tbl).collect()} == got
    # and the direct call reports it
    res = SK.merge_into_parquet(
        spark, tbl,
        spark.createDataFrame([(2, 0.0)], "event_id long, value double"),
        on="event_id", matched_update={"value": col("__s.value")},
        idempotency_token="batch-0")
    assert res.get("already_applied") is True
