"""Second-wave query inventory: as-of / cross / range joins, struct
flatten, deterministic slicing, pivot, having — the SURVEY §2.3/§2.6
declarations beyond the first-wave set.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from .. import tables
from . import q


@q(
    "q_asof_join",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         clicks    AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           CAST(c.value AS DOUBLE) AS click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    desc="as-of join: each purchase matched to the user's most recent "
         "preceding click (union + carry-forward window — ONE shuffle "
         "on user_id, no range join, no per-row subquery).",
    tags=["join", "asof"],
)
def q_asof_join(spark, sf_dir):
    from ..operators.asof import asof_join

    e = tables.load(spark, sf_dir, "events")
    purchases = e.filter(col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(purchases, clicks, on="ts", by="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("right_ts").alias("click_epoch"),
        col("right_value").cast("double").alias("click_value"),
    )


@q(
    "q_cross_join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    desc="nested-loop cross join (tiny dims; BroadcastNestedLoop).",
    tags=["join", "cross"],
)
def q_cross_join(spark, sf_dir):
    r = tables.load(spark, sf_dir, "region")
    n = tables.load(spark, sf_dir, "nation")
    return r.crossJoin(broadcast(n)).select("r_name", "n_name")


@q(
    "q_range_join",
    oracle="""
    WITH buckets(lo, hi, bucket) AS (VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 50, 'large'))
    SELECT bucket, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part JOIN buckets ON p_size BETWEEN lo AND hi
    GROUP BY bucket
    """,
    desc="theta/range join against a literal bucket dim "
         "(BroadcastNestedLoopJoin — the dim side is rows, not rows^2).",
    tags=["join", "range"],
)
def q_range_join(spark, sf_dir):
    p = tables.load(spark, sf_dir, "part")
    buckets = p.sparkSession.createDataFrame(
        [(1, 10, "small"), (11, 25, "medium"), (26, 50, "large")], "lo int, hi int, bucket string"
    )
    return (
        p.join(broadcast(buckets), col("p_size").between(col("lo"), col("hi")))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@q(
    "q_flatten_struct",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS "o.status",
           CAST(o_totalprice AS DOUBLE) AS "o.price"
    FROM orders WHERE o_orderkey < 100
    """,
    desc="P9 flatten: struct column exploded to parent.child top-level "
         "columns (pure projection — zero execution cost).",
    tags=["projection", "struct"],
)
def q_flatten_struct(spark, sf_dir):
    from ..dataset import BioDataset

    o = tables.load(spark, sf_dir, "orders").filter(col("o_orderkey") < 100)
    nested = o.select(
        "o_orderkey",
        F.struct(
            col("o_orderstatus").alias("status"),
            col("o_totalprice").cast("double").alias("price"),
        ).alias("o"),
    )
    return BioDataset(nested).flatten().df


@q(
    "q_slice_offset",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 100
    """,
    desc="P8/O4 contiguous slicing ds[100:120] over a defined order "
         "(offset+limit — no full materialization).",
    tags=["slice", "limit"],
)
def q_slice_offset(spark, sf_dir):
    from ..operators.split import slice_rows

    o = tables.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return slice_rows(o, 100, 120, order_by=["o_orderkey"])


@q(
    "q_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders GROUP BY 1
    """,
    desc="pivot (wide conditional agg): orders per year x status.",
    tags=["agg", "pivot"],
)
def q_pivot(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").alias("yr"), "o_orderstatus")
        .groupBy("yr")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(lit(1)))
        .select(
            "yr",
            F.coalesce("O", lit(0)).alias("n_open"),
            F.coalesce("F", lit(0)).alias("n_filled"),
            F.coalesce("P", lit(0)).alias("n_pending"),
        )
    )


@q(
    "q_having",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 50
    """,
    desc="groupBy + having (post-agg filter).",
    tags=["agg", "having"],
)
def q_having(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .filter(col("n_customers") > 50)
    )


@q(
    "q_collect_list",
    # the collected set is serialized to a comma-joined string in BOTH
    # engines: the driver's value-hasher canonicalizes via pandas
    # sort_values, which cannot factorize top-level array cells
    # (numpy.ndarray is unhashable) — r3 driver-ERR, values verified
    # equal. Serialization changes the wire format only.
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
    desc="collect_set aggregation (sorted + serialized for determinism).",
    tags=["agg", "collect"],
)
def q_collect_list(spark, sf_dir):
    c = tables.load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("segments"),
        F.count("*").alias("n"),
    )


@q(
    "q_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    desc="explicit GROUPING SETS through the spark.sql surface "
         "(registered temp views); partial agg expands grouping ids.",
    tags=["agg", "grouping-sets", "sql"],
)
def q_grouping_sets(spark, sf_dir):
    tables.register_views(spark, sf_dir, ("customer",))
    return spark.sql("""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """)


@q(
    "q_join_renamed_keys",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey < 100
    """,
    desc="J3 generic join with differing key names + coalesce_keys "
         "(right key column absorbed) through the engine's join "
         "operator.",
    tags=["join"],
)
def q_join_renamed_keys(spark, sf_dir):
    from ..operators.joins import join as bjoin

    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    out = bjoin(c, n, keys=["c_nationkey"], right_keys=["n_nationkey"],
                join_type="inner", broadcast_right=True)
    return out.filter(col("c_custkey") < 100).select("c_custkey", "c_name", "n_name")


@q(
    "q_join_multi_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderstatus,
           CAST(l_extendedprice AS DOUBLE) AS price
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_suppkey % 10 = o_custkey % 10
    WHERE l_orderkey < 200
    """,
    desc="J3 multi-key equi-join (composite condition).",
    tags=["join", "multikey"],
)
def q_join_multi_key(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").withColumn("k2", col("l_suppkey") % 10)
    o = tables.load(spark, sf_dir, "orders").withColumn("k2", col("o_custkey") % 10)
    from ..operators.joins import join as bjoin

    out = bjoin(li, o, keys=["l_orderkey", "k2"], right_keys=["o_orderkey", "k2"], join_type="inner")
    return out.filter(col("l_orderkey") < 200).select(
        "l_orderkey", "l_linenumber", "o_orderstatus",
        col("l_extendedprice").cast("double").alias("price"),
    )


@q(
    "q_sort_nulls",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 500 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
    ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 50
    """,
    desc="O1 sort with explicit null placement — verified through the "
         "LIMIT-selected set (nulls-first changes which rows survive).",
    tags=["sort", "nulls"],
)
def q_sort_nulls(spark, sf_dir):
    from ..dataset import BioDataset

    c = tables.load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(col("c_acctbal") < 500, lit(None)).otherwise(col("c_acctbal")).alias("bal"),
    )
    ds = BioDataset(c).sort(["bal", "c_custkey"], null_placement="at_start")
    return ds.df.limit(50)


@q(
    "q_union_type_promotion",
    oracle="""
    WITH u AS (
      SELECT o_orderkey AS key, CAST(o_custkey AS DOUBLE) AS v, NULL AS tag FROM orders
      UNION ALL
      SELECT l_orderkey AS key, CAST(l_quantity AS DOUBLE) AS v, l_returnflag AS tag FROM lineitem
    )
    SELECT COUNT(*) AS n, COUNT(tag) AS n_tagged,
           CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total_v,
           COUNT(DISTINCT key) AS n_keys
    FROM u
    """,
    desc="C1/C3 through the gate: shards with different column types "
         "(long vs double) and a missing column unioned via the upcast "
         "lattice (missing -> null, long -> double promotion).",
    tags=["concat", "lattice"],
)
def q_union_type_promotion(spark, sf_dir):
    from ..schema.lattice import union_promote

    o = tables.load(spark, sf_dir, "orders").select(
        col("o_orderkey").alias("key"), col("o_custkey").alias("v")  # long
    )
    li = tables.load(spark, sf_dir, "lineitem").select(
        col("l_orderkey").alias("key"), col("l_quantity").alias("v"),  # double
        col("l_returnflag").alias("tag"),  # absent from the first shard
    )
    u = union_promote([o, li])
    return u.agg(
        F.count(lit(1)).alias("n"),
        F.count("tag").alias("n_tagged"),
        F.sum(col("v").cast("decimal(18,2)")).cast("double").alias("total_v"),
        F.countDistinct("key").alias("n_keys"),
    )


@q(
    "q_join_salted",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    desc="explicit skew-salted join (operators/skew.py): the hot side "
         "gets a salt in [0,8), the small side is replicated 8x, the "
         "hot key spreads over 8 partitions — output provably identical "
         "to the plain equi-join, which is exactly what the oracle runs.",
    tags=["join", "skew"],
)
def q_join_salted(spark, sf_dir):
    from ..operators.skew import salted_join

    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer").select(
        col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(o, c, on="o_custkey", n_salts=8, how="inner")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@q(
    "q_events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND v.t_view IS NOT NULL AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v WHERE t_view IS NOT NULL) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
    desc="ordered funnel conversion (view -> later click -> later "
         "purchase) per user — conditional-min aggregates + two "
         "broadcastable joins, shuffling only (user_id, ts) pairs.",
    tags=["events", "funnel"],
)
def q_events_funnel(spark, sf_dir):
    e = tables.load(spark, sf_dir, "events")
    v = e.groupBy("user_id").agg(
        F.min(F.when(col("event_type") == "view", col("ts"))).alias("t_view")
    )
    c = (
        e.filter(col("event_type") == "click")
        .join(v.filter(col("t_view").isNotNull()), "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click"))
        .select("user_id")
        .distinct()
        .withColumn("_p", lit(1))
    )
    # one plan, one final single-row agg — no driver-side counting
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_view_click"),
            F.count("_p").alias("n_view_click_purchase"),
        )
    )


@q(
    "q_events_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
             strftime(f.d0, '%Y-%m-%d') AS cohort,
             date_diff('day', f.d0, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort, day_offset, COUNT(*) AS n_users
    FROM act WHERE day_offset <= 7 GROUP BY cohort, day_offset
    """,
    desc="cohort retention: users grouped by first-seen day, distinct "
         "activity per (cohort, day-offset) for the first week — two "
         "shuffles (per-user min, then distinct+agg).",
    tags=["events", "retention"],
)
def q_events_retention(spark, sf_dir):
    e = tables.load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    act = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            F.date_format("d0", "yyyy-MM-dd").alias("cohort"),
            F.datediff(F.to_date("ts"), col("d0")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        act.filter(col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )
