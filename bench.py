"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with the `noop` write format — full
distributed computation, zero driver-side row transfer — so the number is
engine time, not collect/pickle time. Queries whose callable already
materializes internally (counts, ML fit) still measure end-to-end.

Usage: python bench.py [query ...]   # default: all registered queries
"""

# NOTE: no `from __future__ import annotations` — PEP 563 breaks the
# pandas_udf warmup signature below.
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main(names: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from als_hadoop_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()
    selected = names or list(qs)

    # Warm up the JVM / parquet footer caches so q1 doesn't pay session
    # startup; the metric is query time, not cold-start time.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # ... and the Python/Arrow workers, so the first pandas_udf query
    # doesn't pay ~2 s of interpreter + numpy import per executor.
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return s + int(np.int64(0))

    spark.range(1_000).select(_warm("id")).collect()

    # Each query runs twice and we report the SECOND (warm) time: the first
    # run pays one-time whole-stage-codegen compilation of that query's
    # generated classes (~3-10 s for wide projections), which is a per-query
    # JVM warmup cost, not steady-state engine time — on a long-lived cluster
    # it is paid once per plan shape, not once per execution. Data caches are
    # cleared between the two runs (clearCache) so persisted intermediates
    # from the cold run can't make the warm run artificially cheap; codegen
    # class caches survive clearCache, which is exactly the warmth we want.
    timings: dict[str, float] = {}
    timings_cold: dict[str, float] = {}

    # q_als_fit_predict memoizes its fitted model per session
    # (als._PIPELINE_CACHE) so that q_als_rmse can reuse the same fit.
    # Left alone, its warm run would report the memoized lookup (~0.1 s)
    # instead of a fit — so reset the memo before EACH of its runs: the
    # warm number is then a genuine warm-JVM re-fit. q_als_rmse keeps the
    # shared fit, matching its documented contract.
    from als_hadoop_spark.operators import als as _als

    def run_once(name: str, fn) -> float:
        if name == "q_als_fit_predict":
            _als._PIPELINE_CACHE.clear()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    for name in selected:
        fn = qs[name]
        try:
            timings_cold[name] = run_once(name, fn)
            spark.catalog.clearCache()
            warm = run_once(name, fn)
            spark.catalog.clearCache()
            # min-of-2, not strictly run-2: local-mode timings carry
            # multi-second GC/scheduling noise, and a warm run that
            # catches a full GC would otherwise report slower than its
            # own cold run. min() is the steady-state estimator.
            timings[name] = min(warm, timings_cold[name])
        except Exception as e:  # noqa: BLE001 — a broken query must not kill the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": timings_cold,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
