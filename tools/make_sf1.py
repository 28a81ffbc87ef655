"""Synthesize an sf1-scale dataset (10x sf0.1) for the r11 scaling
validation — the driver provides sf{0.001,0.01,0.1} only, and every
prior scale probe was operator-level; this builds table-level inputs
so the ACTUAL bench plans can be timed at 10x.

Construction: each sf0.1 table is replicated 10x with key offsets
that preserve referential integrity (copy i shifts custkey/orderkey/
partkey/suppkey/doc_id/vec_id/event_id/user_id by i * <domain max+1>;
nation/region stay as-is — dimension tables don't grow with sf).
Text/embeddings are NOT perturbed, so dedup-family queries see exact
10-member duplicate groups — a harder (more pair mass), not easier,
input for them.

Writes /tmp/sf1/<table>.parquet. Usage: python tools/make_sf1.py [out_dir] [copies]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key columns shifted per copy: {table: [(col, domain_span_col)]}
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# the span each key is offset by (max+1 of its DOMAIN, shared between
# fact and dim so references stay aligned)
DOMAIN_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
COPY_AS_IS = ["region", "nation"]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from biosets_spark.session import get_spark
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    spans = {}
    for key, (tbl, kcol) in DOMAIN_OF.items():
        if (tbl, kcol) not in spans:
            mx = (spark.read.parquet(f"{SRC}/{tbl}.parquet")
                  .agg(F.max(kcol)).first()[0])
            spans[(tbl, kcol)] = int(mx) + 1
        print(f"{key}: span {spans[(tbl, kcol)]}")

    for t in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: copied as-is")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(copies):
            d = df
            for k in keys:
                span = spans[DOMAIN_OF[k]]
                d = d.withColumn(k, (F.col(k) + F.lit(i * span)).cast(df.schema[k].dataType))
            parts.append(d)
        big = parts[0]
        for d in parts[1:]:
            big = big.unionByName(d)
        big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows ({copies}x)")

    spark.stop()


if __name__ == "__main__":
    main()
