"""File-level data skipping for the versioned table (r9): per-file
min/max stats collected from parquet footers at commit time, consulted
at read to plan tasks only for files whose bounds can match the filter
— the Delta-style skipping index. Soundness bar: pruning must NEVER
change results, only file counts."""

import os

import pytest

from biosets_spark.sources import sink as S


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """A 4-file table clustered on k (disjoint ranges 0-24 / 25-49 /
    50-74 / 75-99), with a string label and some nulls in v."""
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("skip") / "t")
    df = (
        spark.range(100).withColumnRenamed("id", "k")
        .withColumn("label", F.concat(F.lit("item_"),
                                      F.lpad(F.col("k").cast("string"), 3, "0")))
        .withColumn("v", F.when(F.col("k") % 10 == 0, None)
                    .otherwise(F.col("k") * 2.5))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    S.create_table(spark, path, df)
    return path


def test_stats_sidecar_written_at_create(table):
    assert os.path.exists(S._stats_path(table, 0))
    stats = S._load_table_stats(table, 0)
    assert len(stats) == 4
    # every file carries k bounds; ranges are disjoint by construction
    bounds = sorted((S._stat_decode(c["k"]["min"]), S._stat_decode(c["k"]["max"]))
                    for c in stats.values())
    assert bounds[0][0] == 0 and bounds[-1][1] == 99
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2


def test_point_filter_prunes_to_one_file(table):
    kept, total = S.prune_snapshot_files(table, 0, [("k", "=", 30)])
    assert total == 4 and len(kept) == 1


def test_range_filter_prunes_prefix(table):
    kept, total = S.prune_snapshot_files(table, 0, [("k", ">=", 75)])
    assert (len(kept), total) == (1, 4)
    kept, _ = S.prune_snapshot_files(table, 0, [("k", "<", 25)])
    assert len(kept) == 1
    kept, _ = S.prune_snapshot_files(table, 0, [("k", ">", 24), ("k", "<=", 74)])
    assert len(kept) == 2


def test_in_filter(table):
    kept, _ = S.prune_snapshot_files(table, 0, [("k", "in", [3, 90])])
    assert len(kept) == 2


def test_string_column_pruning(table):
    kept, _ = S.prune_snapshot_files(table, 0, [("label", "=", "item_010")])
    assert len(kept) == 1
    kept, _ = S.prune_snapshot_files(table, 0, [("label", ">=", "item_075")])
    assert len(kept) == 1


def test_unknown_op_raises(table):
    with pytest.raises(ValueError, match="unsupported prune op"):
        S.prune_snapshot_files(table, 0, [("k", "!=", 1)])


def test_read_snapshot_where_matches_unpruned(spark, table):
    full = S.read_snapshot(spark, table)
    for filters, pred in [
        ([("k", "=", 30)], "k = 30"),
        ([("k", ">=", 75)], "k >= 75"),
        ([("k", ">", 24), ("k", "<=", 74)], "k > 24 AND k <= 74"),
        ([("label", "=", "item_042")], "label = 'item_042'"),
    ]:
        got = sorted(S.read_snapshot_where(spark, table, filters).collect())
        want = sorted(full.filter(pred).collect())
        assert got == want and got, filters


def test_filter_outside_all_bounds_returns_empty_with_schema(spark, table):
    out = S.read_snapshot_where(spark, table, [("k", ">", 10_000)])
    assert out.count() == 0
    assert out.columns == S.read_snapshot(spark, table).columns


def test_null_rows_never_match_and_pruning_is_sound(spark, table):
    # v is null where k % 10 == 0; comparison filters must exclude them
    got = S.read_snapshot_where(spark, table, [("v", ">=", 0.0)])
    assert got.count() == 90
    assert got.filter("v IS NULL").count() == 0


def test_backfill_for_unindexed_version(spark, table):
    os.remove(S._stats_path(table, 0))
    kept, total = S.prune_snapshot_files(table, 0, [("k", "=", 30)])
    assert (len(kept), total) == (1, 4)
    assert os.path.exists(S._stats_path(table, 0))  # regenerated


def test_merge_and_compact_write_stats_and_vacuum_drops_them(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "t2")
    base = spark.range(50).withColumnRenamed("id", "k") \
        .withColumn("x", F.col("k") * 10)
    S.create_table(spark, path, base)
    src = spark.range(40, 60).withColumnRenamed("id", "k") \
        .withColumn("x", F.col("k") * 100)
    S.merge_into_parquet(
        spark, path, src, on="k",
        matched_update={"x": F.col("__s.x")},
        not_matched_insert={"k": F.col("__s.k"), "x": F.col("__s.x")})
    assert os.path.exists(S._stats_path(path, 1))
    S.compact_table(spark, path, target_rows_per_file=15, sort_by="k")
    assert os.path.exists(S._stats_path(path, 2))
    # the sorted compaction makes skipping effective on the new version
    kept, total = S.prune_snapshot_files(path, 2, [("k", "<", 10)])
    assert total >= 3 and len(kept) == 1
    got = sorted(S.read_snapshot_where(spark, path, [("k", ">=", 55)]).collect())
    want = sorted(S.read_snapshot(spark, path).filter("k >= 55").collect())
    assert got == want and len(got) == 5
    dropped = S.vacuum_table(path, keep_last=1)
    assert dropped == [0, 1]
    assert not os.path.exists(S._stats_path(path, 0))
    assert not os.path.exists(S._stats_path(path, 1))
    assert os.path.exists(S._stats_path(path, 2))


def test_datasource_skipfilters_option(spark, table):
    """spark.read.format('biosets_table').option('skipFilters', ...):
    the option is a coarse file pre-filter (kept files may hold
    non-matching rows), composed with .filter for exact results."""
    import json as _json

    from biosets_spark.sources.table_source import register

    register(spark)
    full = S.read_snapshot(spark, table)
    got = (
        spark.read.format("biosets_table")
        .option("skipFilters", _json.dumps([["k", ">=", 75]]))
        .load(table)
    )
    # superset contract: exactly the rows of the one kept file
    assert got.count() == 25
    exact = sorted(got.filter("k >= 75").collect())
    assert exact == sorted(full.filter("k >= 75").collect())
    # fully-pruned scan: empty result, schema intact, no plan error
    none = (
        spark.read.format("biosets_table")
        .option("skipFilters", _json.dumps([["k", ">", 10000]]))
        .load(table)
    )
    assert none.count() == 0 and none.columns == full.columns
