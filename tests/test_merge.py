"""Functional MERGE (operators/merge.py) and the versioned
MERGE/time-travel table surface (sources/sink.py, r8 verdict task
#5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from biosets_spark.operators.merge import merge_into
from biosets_spark.sources import sink


def _target(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, "D", 40.0)],
        "k long, status string, price double",
    )


def test_merge_into_three_clauses(spark):
    """Matched-update, matched-delete, not-matched-insert in one
    call; unlisted target columns keep their values; unmatched
    target rows pass through untouched."""
    src = spark.createDataFrame(
        [(2, "U", 99.0), (3, "D", 0.0), (9, "I", 5.0)],
        "k long, op string, new_price double",
    )
    out = merge_into(
        _target(spark), src, on="k",
        matched_update={"price": col("__s.new_price")},
        matched_delete=col("__s.op") == "D",
        matched_condition=col("__s.op") == "U",
        not_matched_insert={"status": F.lit("N"),
                            "price": col("__s.new_price")},
    )
    rows = {r.k: (r.status, r.price) for r in out.collect()}
    assert rows == {
        1: ("A", 10.0),   # untouched
        2: ("B", 99.0),   # updated price, status kept
        4: ("D", 40.0),   # untouched
        9: ("N", 5.0),    # inserted
    }  # 3 deleted


def test_merge_into_no_insert_clause_ignores_new_keys(spark):
    src = spark.createDataFrame([(2, 99.0), (9, 5.0)],
                                "k long, new_price double")
    out = merge_into(_target(spark), src, on="k",
                     matched_update={"price": col("__s.new_price")})
    rows = {r.k: r.price for r in out.collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}  # 9 ignored


def test_merge_into_duplicate_source_keys_raise(spark):
    src = spark.createDataFrame([(2, 1.0), (2, 2.0)],
                                "k long, new_price double")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_into(_target(spark), src, on="k",
                   matched_update={"price": col("__s.new_price")})


def test_merge_into_null_keys_are_rows_not_absence(spark):
    """A NULL key value must not read as 'row missing': eqNullSafe
    matches NULL==NULL, and presence comes from sentinels."""
    tgt = spark.createDataFrame([(None, 1.0), (1, 2.0)],
                                "k long, price double")
    src = spark.createDataFrame([(None, 9.0)], "k long, new_price double")
    out = merge_into(tgt, src, on="k",
                     matched_update={"price": col("__s.new_price")})
    rows = {r.k: r.price for r in out.collect()}
    assert rows == {None: 9.0, 1: 2.0}


def test_versioned_table_merge_and_time_travel(spark, tmp_path):
    """create -> merge -> merge; every intermediate state stays
    readable by version and by as-of timestamp; history is append-only."""
    path = str(tmp_path / "tbl")
    v0 = sink.create_table(spark, path, _target(spark))
    assert v0["version"] == 0 and v0["rows"] == 4

    src1 = spark.createDataFrame(
        [(2, "U", 99.0), (9, "I", 5.0)], "k long, op string, new_price double")
    v1 = sink.merge_into_parquet(
        spark, path, src1, on="k",
        matched_update={"price": col("__s.new_price")},
        matched_condition=col("__s.op") == "U",
        not_matched_insert={"status": F.lit("N"),
                            "price": col("__s.new_price")},
    )
    assert v1["version"] == 1 and v1["rows"] == 5

    src2 = spark.createDataFrame([(1, "D", 0.0)],
                                 "k long, op string, new_price double")
    v2 = sink.merge_into_parquet(
        spark, path, src2, on="k",
        matched_delete=col("__s.op") == "D")
    assert v2["version"] == 2 and v2["rows"] == 4

    # current = latest
    cur = {r.k: r.price for r in sink.read_snapshot(spark, path).collect()}
    assert cur == {2: 99.0, 3: 30.0, 4: 40.0, 9: 5.0}
    # explicit version pins
    as0 = {r.k: r.price for r in
           sink.read_snapshot(spark, path, version=0).collect()}
    assert as0 == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    as1 = {r.k for r in sink.read_snapshot(spark, path, version=1).collect()}
    assert as1 == {1, 2, 3, 4, 9}
    # as-of timestamp resolves to the newest commit <= the bound
    asof = sink.read_snapshot(spark, path, as_of=v1["timestamp"])
    assert asof.count() == 5
    hist = sink.table_history(path)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["operation"] for h in hist] == ["create", "merge", "merge"]


def test_versioned_table_vacuum(spark, tmp_path):
    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    for i in range(3):
        src = spark.createDataFrame([(1, 100.0 + i)],
                                    "k long, new_price double")
        sink.merge_into_parquet(
            spark, path, src, on="k",
            matched_update={"price": col("__s.new_price")})
    dropped = sink.vacuum_table(path, keep_last=2)
    assert dropped == [0, 1]
    # retained versions still read; vacuumed ones raise clearly
    assert sink.read_snapshot(spark, path, version=3).count() == 4
    assert sink.read_snapshot(spark, path, version=2).count() == 4
    with pytest.raises(ValueError, match="vacuumed"):
        sink.read_snapshot(spark, path, version=0)
    # history retains the audit trail
    assert [h["version"] for h in sink.table_history(path)] == [0, 1, 2, 3]


def test_versioned_table_guards(spark, tmp_path):
    path = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError, match="create_table"):
        sink.read_snapshot(spark, path)
    sink.create_table(spark, path, _target(spark))
    with pytest.raises(FileExistsError):
        sink.create_table(spark, path, _target(spark))
    with pytest.raises(ValueError, match="version OR as_of"):
        sink.read_snapshot(spark, path, version=0, as_of="2026-01-01")
    with pytest.raises(ValueError, match="not in table log"):
        sink.read_snapshot(spark, path, version=7)
    with pytest.raises(ValueError, match="at or before"):
        sink.read_snapshot(spark, path, as_of="1999-01-01")


def test_merge_into_multi_column_key(spark):
    """Composite merge keys: both columns participate in matching."""
    tgt = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)],
        "k1 long, k2 string, price double")
    src = spark.createDataFrame(
        [(1, "y", 99.0), (2, "y", 5.0)],
        "k1 long, k2 string, new_price double")
    out = merge_into(
        tgt, src, on=["k1", "k2"],
        matched_update={"price": col("__s.new_price")},
        not_matched_insert={"price": col("__s.new_price")})
    rows = {(r.k1, r.k2): r.price for r in out.collect()}
    assert rows == {(1, "x"): 10.0, (1, "y"): 99.0,
                    (2, "x"): 30.0, (2, "y"): 5.0}


def test_merge_into_source_with_count_column(spark):
    """Regression (r8 review): the duplicate-key guard must not
    collide with a source column literally named 'count'."""
    src = spark.createDataFrame([(2, 5, 99.0)],
                                "k long, count int, new_price double")
    out = merge_into(_target(spark), src, on="k",
                     matched_update={"price": col("__s.new_price")})
    assert {r.k: r.price for r in out.collect()}[2] == 99.0


def test_versioned_table_recovers_from_aborted_commit(spark, tmp_path):
    """Regression (r8 review): a crash between the snapshot write and
    the log append leaves an orphan snapshot dir; the retry must
    clear it instead of failing errorifexists forever."""
    import os
    import shutil

    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    # simulate the aborted commit: v1 data written, log never updated
    orphan = os.path.join(path, "_snapshots", "v000001")
    _target(spark).write.parquet(orphan)
    src = spark.createDataFrame([(1, 77.0)], "k long, new_price double")
    v1 = sink.merge_into_parquet(
        spark, path, src, on="k",
        matched_update={"price": col("__s.new_price")})
    assert v1["version"] == 1
    rows = {r.k: r.price for r in sink.read_snapshot(spark, path).collect()}
    assert rows[1] == 77.0
    # aborted create: table dir removed but an orphan v0 left behind
    path2 = str(tmp_path / "tbl2")
    sink.create_table(spark, path2, _target(spark))
    os.remove(os.path.join(path2, "_table_log.json"))
    sink.create_table(spark, path2, _target(spark))  # retry succeeds
    assert sink.read_snapshot(spark, path2).count() == 4


def test_versioned_table_commit_lock(spark, tmp_path):
    """r8 review: concurrent local writers serialize on the commit
    lock; a stale lock (crashed writer) is broken; a held lock times
    out with a clear error."""
    import os
    import time

    from biosets_spark.sources.sink import _table_commit_lock

    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    lock_path = os.path.join(path, "_table_log.json.lock")

    # held lock -> a second acquirer times out with a clear error
    import pytest

    with _table_commit_lock(path):
        with pytest.raises(TimeoutError, match="commit lock"):
            with _table_commit_lock(path, timeout=0.3):
                pass  # pragma: no cover
    assert not os.path.exists(lock_path)  # released on exit

    # stale lock (older than stale_after) is broken and the commit wins
    with open(lock_path, "w") as f:
        f.write("99999")
    old = time.time() - 7200
    os.utime(lock_path, (old, old))
    v = sink.merge_into_parquet(
        spark, path,
        spark.createDataFrame([(1, 123.0)], "k long, new_price double"),
        on="k", matched_update={"price": col("__s.new_price")})
    assert v["version"] == 1
    assert not os.path.exists(lock_path)


def test_table_changes_cdf(spark, tmp_path):
    """r8: change data feed between snapshots — inserts, deletes, and
    update pre/post images, keyed diff over copy-on-write versions."""
    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    src = spark.createDataFrame(
        [(2, "U", 99.0), (3, "D", 0.0), (9, "I", 5.0)],
        "k long, op string, new_price double")
    sink.merge_into_parquet(
        spark, path, src, on="k",
        matched_update={"price": col("__s.new_price")},
        matched_delete=col("__s.op") == "D",
        matched_condition=col("__s.op") == "U",
        not_matched_insert={"status": F.lit("N"),
                            "price": col("__s.new_price")})
    cdf = sink.table_changes(spark, path, 0, 1, on="k")
    got = sorted((r.k, r._change_type, r.price) for r in cdf.collect())
    assert got == [
        (2, "update_postimage", 99.0),
        (2, "update_preimage", 20.0),
        (3, "delete", 30.0),
        (9, "insert", 5.0),
    ]
    # default to_version = current; unchanged rows never appear
    assert {r.k for r in sink.table_changes(spark, path, 0, on="k").collect()} == {2, 3, 9}
    # identical versions -> empty feed
    assert sink.table_changes(spark, path, 1, 1, on="k").count() == 0


def test_compact_table_commits_new_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    for i in range(3):  # accrete small commits
        sink.merge_into_parquet(
            spark, path,
            spark.createDataFrame([(100 + i, 1.0 * i)],
                                  "k long, new_price double"),
            on="k", not_matched_insert={"price": col("__s.new_price")})
    entry = sink.compact_table(spark, path, target_rows_per_file=100)
    assert entry["operation"] == "compact" and entry["files"] == 1
    cur = sink.read_snapshot(spark, path)
    assert cur.count() == 7
    assert cur.rdd.getNumPartitions() == 1  # one compacted file
    # rows identical to the pre-compaction version
    pre = {(r.k, r.price) for r in
           sink.read_snapshot(spark, path, version=3).collect()}
    assert {(r.k, r.price) for r in cur.collect()} == pre


def test_merge_into_schema_evolution(spark, tmp_path):
    """r8: allow_schema_evolution appends clause-named columns absent
    from the target (NULL on untouched rows); without the flag the
    unknown name raises loudly."""
    import pytest

    src = spark.createDataFrame(
        [(2, 99.0, "eu"), (9, 5.0, "us")],
        "k long, new_price double, region string")
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_into(_target(spark), src, on="k",
                   matched_update={"region": col("__s.region")})
    out = merge_into(
        _target(spark), src, on="k",
        matched_update={"price": col("__s.new_price"),
                        "region": col("__s.region")},
        not_matched_insert={"price": col("__s.new_price"),
                            "region": col("__s.region")},
        allow_schema_evolution=True)
    rows = {r.k: (r.price, r.region) for r in out.collect()}
    assert rows == {
        1: (10.0, None), 2: (99.0, "eu"), 3: (30.0, None),
        4: (40.0, None), 9: (5.0, "us"),
    }
    # the versioned-table surface threads the flag through; the new
    # column persists into the committed snapshot
    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    sink.merge_into_parquet(
        spark, path, src, on="k",
        matched_update={"price": col("__s.new_price"),
                        "region": col("__s.region")},
        not_matched_insert={"price": col("__s.new_price"),
                            "region": col("__s.region")},
        allow_schema_evolution=True)
    snap = sink.read_snapshot(spark, path)
    assert "region" in snap.columns
    assert {r.region for r in snap.collect()} == {None, "eu", "us"}


def test_compact_table_clusters_with_sort_by(spark, tmp_path):
    """compact_table(sort_by=...) range-clusters files: each output
    file covers a disjoint key range (row-group pruning layout)."""
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "tbl")
    sink.create_table(
        spark, path,
        spark.createDataFrame([(i * 37 % 100, float(i)) for i in range(100)],
                              "k long, price double"))
    entry = sink.compact_table(spark, path, target_rows_per_file=50,
                               sort_by="k")
    assert entry["files"] == 2
    snap_dir = str(tmp_path / "tbl" / "_snapshots" /
                   f"v{entry['version']:06d}")
    ranges = []
    for f in sorted(glob.glob(snap_dir + "/*.parquet")):
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        if t:
            ranges.append((min(t), max(t)))
    ranges.sort()
    assert len(ranges) == 2
    assert ranges[0][1] <= ranges[1][0]  # disjoint key ranges


def test_read_change_feed_skips_compact_commits(spark, tmp_path):
    """r9 (advice): a 'compact' commit is a physical rewrite with no
    logical changes and never writes a feed — batch read_change_feed
    over a range spanning it must skip it (mirroring the streaming
    reader), not raise."""
    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark), write_change_feed=True)
    sink.merge_into_parquet(
        spark, path,
        spark.createDataFrame([(9, 5.0)], "k long, new_price double"),
        on="k", not_matched_insert={"price": col("__s.new_price")},
        write_change_feed=True)
    sink.compact_table(spark, path, target_rows_per_file=100)  # v2, no feed
    sink.merge_into_parquet(
        spark, path,
        spark.createDataFrame([(10, 6.0)], "k long, new_price double"),
        on="k", not_matched_insert={"price": col("__s.new_price")},
        write_change_feed=True)  # v3
    feed = sink.read_change_feed(spark, path, 1)  # spans the compact
    assert sorted((r.k, r._commit_version) for r in feed.collect()
                  if r._change_type == "insert") == [(9, 1), (10, 3)]
    # a DATA-CHANGING commit without a feed must still raise
    sink.merge_into_parquet(
        spark, path,
        spark.createDataFrame([(11, 7.0)], "k long, new_price double"),
        on="k", not_matched_insert={"price": col("__s.new_price")},
        write_change_feed=False)  # v4
    with pytest.raises(ValueError, match=r"\[4\].*without"):
        sink.read_change_feed(spark, path, 0)
    # a compact-only range has no logical changes -> actionable error
    with pytest.raises(ValueError, match="compact-only"):
        sink.read_change_feed(spark, path, 2, 2)


def test_vacuum_keep_last_zero_rejected(spark, tmp_path):
    """r9 (advice): keep_last=0 would delete the snapshot that
    log['current'] points at, bricking the table — reject upfront."""
    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    with pytest.raises(ValueError, match="keep_last"):
        sink.vacuum_table(path, keep_last=0)
    with pytest.raises(ValueError, match="keep_last"):
        sink.vacuum_table(path, keep_last=-3)
    # table still fully readable
    assert sink.read_snapshot(spark, path).count() == 4


def test_concurrent_writers_serialize_no_lost_commit(spark, tmp_path):
    """r9 (verdict task #6): two real merge_into_parquet writers racing
    on one table — the advisory lock must serialize them so BOTH
    commits land with distinct consecutive versions and the final
    snapshot contains both writers' rows (no lost update: each commit
    rewrites from the other's committed snapshot, not from a stale
    read)."""
    import threading

    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))

    errors = []

    def writer(key, price):
        try:
            sink.merge_into_parquet(
                spark, path,
                spark.createDataFrame([(key, price)],
                                      "k long, new_price double"),
                on="k",
                not_matched_insert={"status": F.lit("N"),
                                    "price": col("__s.new_price")})
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(100 + i, float(i)))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    log = sink._table_log_read(path)
    versions = [v["version"] for v in log["versions"]]
    assert versions == [0, 1, 2, 3, 4]  # serialized, none lost
    assert log["current"] == 4
    rows = {r.k for r in sink.read_snapshot(spark, path).collect()}
    assert rows == {1, 2, 3, 4, 100, 101, 102, 103}  # all four inserts


def test_lock_deadline_honored_on_persistent_stat_failure(
        spark, tmp_path, monkeypatch):
    """r9 regression pin for commit 3131439: when the lock file exists
    but every mtime stat fails (e.g. another host keeps recreating
    it), acquisition must still honor the deadline and raise
    TimeoutError — not spin forever."""
    import os
    import time

    from biosets_spark.sources.sink import _table_commit_lock

    path = str(tmp_path / "tbl")
    sink.create_table(spark, path, _target(spark))
    lock_path = os.path.join(path, "_table_log.json.lock")
    with open(lock_path, "w") as f:
        f.write("held")

    real_getmtime = os.path.getmtime

    def failing_getmtime(p):
        if p == lock_path:
            raise OSError("transient stat failure")
        return real_getmtime(p)

    monkeypatch.setattr(os.path, "getmtime", failing_getmtime)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="commit lock"):
        with _table_commit_lock(path, timeout=0.5):
            pass  # pragma: no cover
    elapsed = time.monotonic() - t0
    assert elapsed < 10  # bounded by the deadline, not spinning
    os.unlink(lock_path)
