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

    # The EFFECTIVE core count (r12, VERDICT r11 reporting nit): the
    # session honors $SPARK_GRAFT_CPUS (local[$SPARK_GRAFT_CPUS]), but
    # this field used to report os.cpu_count(), so the driver's 8-core
    # scaling artifact said "cpus": 32. Report what the master actually
    # runs with; falls back to the machine count exactly like the
    # session does.
    effective_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

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

    # Machine-calibration datum (VERDICT r6 #3): round-over-round
    # absolute seconds drift with machine state (the r5→r6 "35%
    # regression" reproduced nowhere — same code measured 96→130→150 s
    # across sessions on one box). Time a FIXED, data-independent,
    # CPU-bound reference job and record it in the JSON so BENCH_rN
    # comparisons can normalize: ratio = (total/calibration) is
    # machine-state-invariant to first order. min-of-3 on a fixed
    # 200M-row xxhash64 reduction — pure codegen arithmetic, no IO,
    # no Python, parallel across all task slots.
    def _calibrate() -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            # avg, not sum: a long sum of 2^63-range hashes overflows
            # under the session's ANSI mode
            spark.range(200_000_000).selectExpr(
                "avg(xxhash64(id))"
            ).collect()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    calibration = _calibrate()

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

    def clear_caches() -> None:
        # catalog.clearCache() drops SQL-cached relations, but MLlib
        # fits (ALS, KMeans) and localCheckpoint()s persist raw RDDs the
        # SQL cache manager doesn't know about; left alone they pile up
        # across 90+ queries and the storage-memory pressure bleeds into
        # later measurements (observed: q_embed_centroid 4.6 s mid-suite
        # vs 0.97 s isolated). Unpersist everything between runs.
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)
        # GC hint: after ~90 heavy queries the old-gen fills with dead
        # plan/codegen objects and collections start landing INSIDE later
        # timed runs (observed ±3 s swings on mid-suite queries that are
        # stable in isolation); an explicit collection between timed runs
        # moves that cost out of the measurements.
        spark.sparkContext._jvm.System.gc()

    # Convergence loop, not a fixed run count: run 2 still pays JIT
    # (C2) compilation of the generated bytecode for multi-stage plans —
    # measured on q_dedup_ngram at sf0.1: 9.5 / 6.9 / 2.6 / 2.3 / 2.2 s
    # across five consecutive runs, so min-of-2 would report ~3x the
    # steady state. Keep re-running (4 max) until the two best times
    # agree within 25% or the best is already sub-second; report the
    # min. Stable queries stop at 2 runs, so the extra cost lands only
    # on the heavy unstable ones.
    MAX_RUNS, REL_TOL = 4, 0.25

    def converged(runs: list[float]) -> bool:
        best, second = sorted(runs)[:2]
        return best < 1.0 or (second - best) / best <= REL_TOL

    for name in selected:
        fn = qs[name]
        try:
            runs = [run_once(name, fn)]
            timings_cold[name] = runs[0]
            clear_caches()
            while len(runs) < MAX_RUNS:
                runs.append(run_once(name, fn))
                clear_caches()
                if converged(runs):
                    break
            timings[name] = min(runs)
        except Exception as e:  # noqa: BLE001 — a broken query must not kill the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    full = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": timings_cold,
        "sf": sf_from_dir(SF_DIR),
        "calibration_sec": calibration,
        "cpus": effective_cpus,
        "normalized_total": round(total / calibration, 2) if calibration else -1.0,
    }
    # Full per-query dict goes to a file; the harness that invokes this
    # script captures only a short stdout tail, so the FINAL printed line
    # must stay well under 4 KB — summary stats plus the slowest queries
    # only (135 warm+cold entries is ~8 KB and used to truncate).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json")
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    ok = sorted(t for t in timings.values() if t >= 0)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15])
    print(
        json.dumps(
            {
                "metric": "total_query_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf_from_dir(SF_DIR),
                "n": len(timings),
                "failed": sum(1 for t in timings.values() if t < 0),
                "median": round(ok[len(ok) // 2], 3) if ok else -1.0,
                "calibration_sec": calibration,
                "cpus": effective_cpus,
                "normalized_total": round(total / calibration, 2) if calibration else -1.0,
                "queries": slowest,
                "full_results": out_path,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
