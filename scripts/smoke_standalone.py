"""Standalone-cluster smoke (r10, VERDICT r9 #8 stretch).

local[N] hides serialization, real-socket shuffle, and
executor-process isolation — exactly the places a "works on my laptop"
Spark job dies on a real cluster. This script runs the N heaviest
registered queries (by the last driver bench) against a REAL
``spark://`` standalone master with separate worker JVMs, using the
same session profile as everything else (``SPARK_GRAFT_MASTER`` swaps
only the deploy mode).

Cluster bring-up (pip-installed pyspark has spark-class but not the
sbin helpers)::

    SPARK_HOME=$(python -c "import pyspark,os;print(os.path.dirname(pyspark.__file__))")
    $SPARK_HOME/bin/spark-class org.apache.spark.deploy.master.Master \
        --host 127.0.0.1 --port 7077 --webui-port 8090 &
    for i in 1 2 3 4; do
      $SPARK_HOME/bin/spark-class org.apache.spark.deploy.worker.Worker \
          spark://127.0.0.1:7077 --cores 8 --memory 8g \
          --webui-port 809$i &
    done

Then::

    python scripts/smoke_standalone.py            # heaviest queries
    python scripts/smoke_standalone.py q_filter   # explicit list
    python scripts/smoke_standalone.py all        # FULL surface

Prints one JSON line per query and a summary line; non-zero exit on
any failure. Executors need this repo on PYTHONPATH
(``spark.executorEnv.PYTHONPATH`` is set below) because pandas_udf
closures referencing module helpers pickle BY REFERENCE — running this
is precisely how that class of bug is caught before a real cluster.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MASTER = os.environ.get("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077")

#: the 10 heaviest queries of the last driver bench (BENCH_r09.json),
#: heaviest first — streaming lifecycles, iterative ACID maintenance,
#: lineage-checkpointed pagerank, ALS fits, the persisted-ANN serve
DEFAULT_QUERIES = [
    "q_acid_stream_ivm",
    "q_acid_ivm_loop",
    "q_graph_pagerank",
    "q_acid_cdf",
    "q_acid_incremental",
    "q_als_rank_sweep",
    "q_als_fit_predict",
    "q_column_profile_fast",
    "q_fuzzy_join",
    "q_sim_search_ivf_indexed",
    # r10 session-2 additions: the SQL front door's MERGE/time-travel
    # routing and the two-window sessionizer, through real executors
    "q_sql_surface",
    "q_sessionize",
]


def main(names: list[str]) -> int:
    os.environ["SPARK_GRAFT_MASTER"] = MASTER
    import __spark_entry__ as entry_mod
    from als_hadoop_spark.session import get_spark

    spark = get_spark(
        "smoke_standalone",
        extra_conf={
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.executor.memory": os.environ.get(
                "SPARK_GRAFT_EXECUTOR_MEM", "6g"
            ),
            "spark.checkpoint.dir": "/tmp/spark-standalone/ckpt",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # executors up
    n_exec = spark.sparkContext.defaultParallelism
    master_used = spark.sparkContext.master
    assert master_used.startswith("spark://"), (
        f"not a standalone cluster: {master_used} — start the master/"
        "workers first (docstring)"
    )
    qs = entry_mod.queries()
    # `all` = the full registered surface (driver priority order) —
    # the honest version of the smoke: every query through real
    # executor processes, not just the heavy ten
    names = list(qs) if names == ["all"] else (names or DEFAULT_QUERIES)
    results, failed = {}, []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            rows = df.count()
            dt = time.time() - t0
            results[name] = round(dt, 2)
            print(
                json.dumps(
                    {"query": name, "sec": round(dt, 2), "rows": rows}
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — smoke must report all
            failed.append(name)
            print(
                json.dumps({"query": name, "error": str(exc)[:300]}),
                flush=True,
            )
    print(
        json.dumps(
            {
                "metric": "standalone_smoke_total_sec",
                "value": round(sum(results.values()), 2),
                "unit": "sec",
                "master": master_used,
                "parallelism": n_exec,
                "queries": results,
                "failed": failed,
                "sf_dir": SF_DIR,
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
