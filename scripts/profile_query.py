"""Per-query optimization profiler (round 11).

For each named query: runs it twice through the bench's noop-sink
protocol on the bench session profile, reporting cold/warm seconds,
the number of Spark jobs each run launched (commit-machinery actions
included), and writing the warm run's `explain('formatted')` to
plans/r11/<query>_<tag>.txt.

    python scripts/profile_query.py [--tag before] q_a q_b ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
)


def main(argv: list[str]) -> int:
    tag = "before"
    if argv and argv[0] == "--tag":
        tag = argv[1]
        argv = argv[2:]

    import __spark_entry__ as entry_mod
    from als_hadoop_spark.session import get_spark

    spark = get_spark("profile_r11")
    sc = spark.sparkContext
    qs = entry_mod.queries()
    names = argv or list(qs)
    os.makedirs(PLANS_DIR, exist_ok=True)

    # warm the JVM + Python workers like bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1_000).select(_warm("id")).collect()

    def job_count() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    for name in names:
        fn = qs[name]
        runs = []
        plan = None
        for i in range(2):
            spark.catalog.clearCache()
            for rdd in list(sc._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
            j0 = job_count()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            runs.append((t_total, t_build, job_count() - j0))
            if i == 1:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        (t_cold, b_cold, j_cold), (t_warm, b_warm, j_warm) = runs
        print(
            f"{name:32s} cold {t_cold:7.2f}s (build {b_cold:6.2f}s, {j_cold} jobs)"
            f"  warm {t_warm:7.2f}s (build {b_warm:6.2f}s, {j_warm} jobs)"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan or "")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
