"""Round-10 streaming-throughput probe: 1M synthetic events (100
parquet files, ~170x the sf0.1 events table) drained through the
windowed-count and stateful-dedup operators with
Trigger.AvailableNow, recording rows/s and the final state size —
the streaming family's first measured rate (its boundedness proofs
live in tests/test_streaming_state.py).

Usage: python tools/scale_probe_r10d.py [n_rows] [n_files]
"""

import shutil
import sys
import time

sys.path.insert(0, ".")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biosets_spark.session import get_spark
    from biosets_spark.streaming import ingest as SI

    spark = get_spark("scale-probe-r10d", extra_conf={
        "spark.sql.shuffle.partitions": "32",
    })

    import datetime as dt
    import os

    src = f"/tmp/probe_r10d_events_{n_rows}"
    if not os.path.exists(src):
        os.makedirs(src)
        per = n_rows // n_files
        base = dt.datetime(2024, 1, 1)
        # event time advances ~36 s per file -> ~1 h across the run;
        # 10k users, 5 event types
        for i in range(n_files):
            ids = pa.array(range(i * per, (i + 1) * per), pa.int64())
            ts = pa.array(
                [base + dt.timedelta(seconds=i * 36 + (j % 36))
                 for j in range(per)], pa.timestamp("us"))
            pq.write_table(pa.table({
                "event_id": ids,
                "ts": ts,
                "user_id": pa.array([j % 10_000 for j in range(per)],
                                    pa.int64()),
                "event_type": pa.array(
                    [("click", "view", "purchase", "error", "signup")[j % 5]
                     for j in range(per)], pa.string()),
                "value": pa.array([float(j % 97) for j in range(per)],
                                  pa.float64()),
                "props": pa.array(["{}"] * per, pa.string()),
            }), os.path.join(src, f"f{i:04d}.parquet"))
    print(f"corpus: {n_rows} events in {n_files} files")

    def drain(name, make_stream, output_mode):
        ckpt = f"/tmp/probe_r10d_ckpt_{name}"
        shutil.rmtree(ckpt, ignore_errors=True)
        sdf = SI.read_stream(spark, src, max_files_per_trigger=20)
        q = (
            make_stream(sdf).writeStream.format("noop")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.time()
        q.awaitTermination(600)
        dt_s = time.time() - t0
        state = max(
            (op.get("numRowsTotal", 0)
             for p in q.recentProgress for op in p["stateOperators"]),
            default=0)
        batches = len(q.recentProgress)
        q.stop()
        print(f"{name:28} wall={dt_s:6.1f}s {n_rows / dt_s / 1e3:8.0f}k rows/s "
              f"batches={batches} peak_state_rows={state}")

    drain("windowed_counts",
          lambda s: SI.windowed_counts(
              s, window="5 minutes", watermark="10 minutes",
              keys=["event_type"]),
          "append")
    drain("stateful_dedup",
          lambda s: SI.dedup_within_watermark(
              s, keys=["event_id"], watermark="10 minutes"),
          "append")
    drain("sessionized",
          lambda s: SI.sessionized(
              s, gap="2 minutes", watermark="10 minutes"),
          "append")


if __name__ == "__main__":
    main()
