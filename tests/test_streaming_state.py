"""Streaming state-size plateau proof (VERDICT r9, item 5): the
watermark-bounded operators claim bounded state (docs/SCALE.md) — pin
it by feeding a long synthetic stream one file per micro-batch and
reading ``stateOperators.numRowsTotal`` from the query progress. With
event time advancing 1 hour per file and a 2-hour watermark, state
must plateau at ~(horizon hours) x (keys/hour), NOT grow with the
total key count; a broken watermark would accumulate every key ever
seen. The measured plateau row for PERFORMANCE.md comes from the same
numbers."""

import datetime as dt

import pytest

from biosets_spark.streaming import ingest as SI

N_HOURS = 24
KEYS_PER_HOUR = 100


@pytest.fixture(scope="module")
def long_stream_dir(tmp_path_factory):
    """24 flat parquet FILES (one per hour — the file-stream source
    does not recurse into per-write directories), file i = 100 unique
    event_ids all stamped in hour i — a day-long stream with 2 400
    distinct keys total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    root = tmp_path_factory.mktemp("long_stream")
    for h in range(N_HOURS):
        rows = [
            (h * KEYS_PER_HOUR + i,
             base + dt.timedelta(hours=h, seconds=i),
             i % 7, "click", 1.0, "{}")
            for i in range(KEYS_PER_HOUR)
        ]
        table = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        })
        pq.write_table(table, str(root / f"h{h:02d}.parquet"))
    return str(root)


def _drain_collect_state(spark, stream_df, name, ckpt_dir):
    """Run to completion one file per micro-batch; return the
    numRowsTotal trajectory (one entry per micro-batch with state).
    ``ckpt_dir`` comes from pytest's tmp_path so concurrent checkouts
    / parallel runs on one host never collide on a checkpoint."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    traj = []
    for p in q.recentProgress:
        for op in p["stateOperators"]:
            if op.get("numRowsTotal") is not None:
                traj.append(op["numRowsTotal"])
    q.stop()
    return traj


def test_dedup_state_plateaus_at_watermark_horizon(spark, long_stream_dir, tmp_path):
    sdf = SI.read_stream(spark, long_stream_dir, max_files_per_trigger=1)
    dd = SI.dedup_within_watermark(sdf, keys=["event_id"], watermark="2 hours")
    traj = _drain_collect_state(spark, dd, "state_dedup", tmp_path / "ckpt")
    assert len(traj) >= N_HOURS - 2, f"expected per-file batches, got {traj}"
    # plateau: state holds the watermark horizon plus eviction lag
    # (watermark advances at END of batch; cleanup applies the NEXT
    # batch → ~5h of keys retained; measured flat at exactly 500 for
    # 18 straight batches), never the full day (2 400)
    plateau = max(traj[6:])
    assert plateau <= 6 * KEYS_PER_HOUR, (
        f"state grew past the watermark horizon: {traj}")
    # and the horizon is actually retained (not dropping everything)
    assert plateau >= 2 * KEYS_PER_HOUR, f"state under-retained: {traj}"
    # growth check: last-third max no bigger than mid-third max + slack
    third = len(traj) // 3
    assert max(traj[2 * third:]) <= max(traj[third:2 * third]) + KEYS_PER_HOUR, (
        f"state still growing in the final third: {traj}")


def test_windowed_agg_state_plateaus(spark, long_stream_dir, tmp_path):
    sdf = SI.read_stream(spark, long_stream_dir, max_files_per_trigger=1)
    agg = SI.windowed_counts(sdf, window="1 hour", watermark="2 hours",
                             keys=["user_id"])
    traj = _drain_collect_state(spark, agg, "state_win", tmp_path / "ckpt")
    assert len(traj) >= N_HOURS - 2
    # state = (windows in horizon) x 7 users — tens of rows, not
    # N_HOURS x 7
    plateau = max(traj[6:])
    assert plateau <= 5 * 7, f"window state unbounded: {traj}"
    assert plateau >= 7, f"window state under-retained: {traj}"
