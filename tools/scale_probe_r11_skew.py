"""Round-11 hot-bucket skew probe for MinHash-LSH / SimHash blocking.

The band-bucket (and simhash chunk-bucket) self-join is quadratic PER
BUCKET; a boilerplate corpus puts one group's whole mass in one bucket
and therefore one task. r11 added ``max_bucket_size`` (star pairing
above the cap, operators/dedup.py:_capped_bucket_pairs); this probe
measures that the capped plan's wall time stays bounded as the planted
hot-group size grows, while the uncapped plan's grows quadratically.

Corpus: ``n_hot`` copies of one boilerplate paragraph (doc_ids
0..n_hot-1) + ``n_cold`` distinct synthetic docs (8 pseudo-random
words each from xxhash64, so cold docs share almost no shingles).
Every band bucket of the hot group holds all n_hot members.

Protocol: sweep n_hot in {2k, 8k, 32k, 100k} with n_cold=100k;
capped (default 1024) runs at every size; uncapped runs only while
n_hot <= uncapped_max (default 8k — 8k docs is already 32M intra-
bucket pairs per band) to record the quadratic trend without a
multi-hour run. Also asserts the capped output is exactly the star
set (n_hot - 1 pairs at jaccard/hamming verified) plus cold pairs.

Usage: python tools/scale_probe_r11_skew.py [n_cold] [uncapped_max]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

BOILER = (
    "subscribe to our newsletter for the latest updates terms of service "
    "privacy policy all rights reserved copyright notice cookie settings "
    "contact us about careers press kit do not sell my personal information"
)


def synth_corpus(spark, n_hot: int, n_cold: int):
    hot = spark.range(n_hot, numPartitions=32).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text"))
    words = [
        F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                                    F.lit(50_000)).cast("string"))
        for j in range(8)
    ]
    cold = spark.range(n_cold, numPartitions=32).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"))
    return hot.unionByName(cold)


def run_case(spark, fn_name, df, n_hot, **kw):
    from biosets_spark.operators import dedup as D
    fn = getattr(D, fn_name)
    t0 = time.monotonic()
    out = fn(df, **kw)
    n_pairs = out.count()
    wall = time.monotonic() - t0
    # hot-group pair count: star = n_hot - 1, quadratic = n_hot*(n_hot-1)/2
    n_hot_pairs = out.filter((F.col("id_a") < n_hot) & (F.col("id_b") < n_hot)).count()
    return wall, n_pairs, n_hot_pairs


def main():
    n_cold = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    uncapped_max = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000

    from biosets_spark.session import get_spark
    spark = get_spark("scale-probe-r11-skew")
    spark.sparkContext.setLogLevel("ERROR")

    for n_hot in (2_000, 8_000, 32_000, 100_000):
        df = synth_corpus(spark, n_hot, n_cold)
        df.cache().count()
        for fn_name, kw in (
            ("minhash_lsh_pairs", dict(threshold=0.5)),
            ("simhash_pairs", dict(max_hamming=3)),
        ):
            wall, n, nh = run_case(spark, fn_name, df, n_hot, **kw)
            star_ok = nh == n_hot - 1
            print(f"{fn_name} n_hot={n_hot:>7} capped:   wall={wall:7.1f}s "
                  f"pairs={n} hot_pairs={nh} star_exact={star_ok}", flush=True)
            if n_hot <= uncapped_max:
                wall_u, n_u, nh_u = run_case(
                    spark, fn_name, df, n_hot, max_bucket_size=None, **kw)
                quad = n_hot * (n_hot - 1) // 2
                print(f"{fn_name} n_hot={n_hot:>7} uncapped: wall={wall_u:7.1f}s "
                      f"pairs={n_u} hot_pairs={nh_u} (quad={quad})", flush=True)
        df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
