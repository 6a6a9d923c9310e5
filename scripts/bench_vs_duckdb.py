"""Self-measured Spark-vs-DuckDB comparison (the BASELINE.md 2× gate).

Times every oracle-backed query both ways at $SPARK_GRAFT_SF_DIR:
Spark runs the registered `queries()` callable to completion (noop
sink); DuckDB runs the `oracle_sql()` twin on the same parquet.
Prints a table plus geomean ratio. Usage:

    python scripts/bench_vs_duckdb.py [query ...]
"""

# NOTE: no `from __future__ import annotations` — PEP 563 breaks the
# pandas_udf warmup signature below.
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(names: list[str]) -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from als_hadoop_spark.session import get_spark

    spark = get_spark("bench_vs_duckdb")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up JVM
    # warm Python/Arrow workers too (else the first pandas_udf query
    # pays ~2-3 s of interpreter + numpy import)
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return s + int(np.int64(0))

    spark.range(1_000).select(_warm("id")).collect()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    selected = [n for n in (names or list(qs)) if n in oracles]
    rows = []
    for name in selected:
        # Warm (second-run) timing on BOTH engines, mirroring bench.py:
        # run 1 pays Spark's per-plan codegen compile / DuckDB's buffer
        # warm-up; run 2 is steady state.
        t_spark = t_duck = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t_spark = time.perf_counter() - t0
            spark.catalog.clearCache()
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            t_duck = time.perf_counter() - t0
        rows.append((name, t_spark, t_duck, t_spark / max(t_duck, 1e-9)))

    rows.sort(key=lambda r: -r[3])
    print(f"{'query':30s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>7s}")
    for name, ts, td, ratio in rows:
        print(f"{name:30s} {ts:8.2f} {td:8.2f} {ratio:7.1f}")
    geo = math.exp(sum(math.log(r[3]) for r in rows) / len(rows))
    within2x = sum(1 for r in rows if r[3] <= 2.0)
    print(f"\ngeomean ratio {geo:.2f}x; {within2x}/{len(rows)} within 2x; sf_dir={SF_DIR}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
