"""CDC write-amplification A/B: copy-on-write vs deletion vectors.

Re-runs the r10 layout-erosion experiment (BASELINE.md "Round-10: CDC
layout-erosion A/B") with the r11 merge-on-read arm: a partitioned +
bloom'd ACID table seeded from 2 M x100 orders rows (partitionBy
o_orderpriority, 5 partitions), then N MERGEs each touching ALL 5
partitions (one key per partition — the realistic CDC batch shape).

Arms:
  cow — the r10 shipped layout-preserving copy-on-write
  dv  — the r11 deletion-vector commit (table property flipped on)

Tracked per merge: wall seconds, live data-file count, planned
InputPartitions under ``o_orderpriority = '1-URGENT'`` (partition
elimination must survive BOTH arms), and live DV sidecar count. After
the loop, one OPTIMIZE materializes the dv arm's masks and the final
snapshot row counts of both arms are compared.

Usage:
    python scripts/bench_cdc_dv_ab.py [sf_dir] [n_merges]
Defaults: /tmp/sf01_x100, 20. Prints one JSON line per arm.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def planned_under_pred(spark, path, schema):
    from pyspark.sql.datasource import EqualTo

    from als_hadoop_spark.sources.acid_format import build_acid_format_source

    src = build_acid_format_source()(options={"path": path})
    reader = src.reader(schema)
    list(reader._push_filters([EqualTo(("o_orderpriority",), "1-URGENT")]))
    return len([p for p in reader.partitions() if p.path])


def run_arm(spark, sf_dir: str, arm: str, n_merges: int) -> dict:
    from pyspark.sql import functions as F

    from als_hadoop_spark.sources.acid import AcidTable
    from als_hadoop_spark.sources.acid_format import register_acid_format

    register_acid_format(spark)
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .limit(2_000_000)
    )
    path = os.path.join(
        tempfile.gettempdir(), f"cdc_dv_ab_{arm}_{os.getpid()}"
    )
    shutil.rmtree(path, ignore_errors=True)
    (
        orders.repartitionByRange(8, "o_orderkey")
        .write.format("acid")
        .option("path", path)
        .option("partitionBy", "o_orderpriority")
        .option("bloomFilterColumns", "o_orderkey")
        .mode("append")
        .save()
    )
    tbl = AcidTable(spark, path)
    if arm == "dv":
        tbl.set_property("deletionVectors", "true")
    schema = tbl.snapshot().schema
    prios = [
        r[0]
        for r in tbl.snapshot().select("o_orderpriority").distinct().collect()
    ]
    keys_per_prio = {
        p: [
            r[0]
            for r in tbl.snapshot()
            .filter(F.col("o_orderpriority") == p)
            .select("o_orderkey")
            .limit(n_merges)
            .collect()
        ]
        for p in prios
    }

    def upsert(touched, chg):
        c = chg.select(
            "o_orderkey", F.col("o_totalprice").alias("_np")
        )
        j = touched.join(c, "o_orderkey", "full_outer")
        return j.select(
            "o_orderkey",
            "o_orderpriority",
            F.coalesce("_np", "o_totalprice").alias("o_totalprice"),
        )

    per_merge = []
    for i in range(n_merges):
        batch = spark.createDataFrame(
            [
                (keys_per_prio[p][i], p, 12345.0 + i)
                for p in prios
            ],
            "o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE",
        )
        t0 = time.time()
        tbl.merge(batch, "o_orderkey", upsert)
        dt = time.time() - t0
        st = tbl._state()
        n_sidecars = len(
            {s for a in st["live"].values() for s in a.get("dv", ())}
        )
        per_merge.append(
            {
                "sec": round(dt, 2),
                "files": len(st["live"]),
                "planned_urgent": planned_under_pred(spark, path, schema),
                "dv_sidecars": n_sidecars,
            }
        )
    rows_before_opt = tbl.snapshot().count()
    t0 = time.time()
    tbl.optimize(target_files=40)
    opt_sec = round(time.time() - t0, 2)
    st = tbl._state()
    out = {
        "arm": arm,
        "n_merges": n_merges,
        "sec_per_commit": round(
            sum(m["sec"] for m in per_merge) / n_merges, 2
        ),
        "first5": per_merge[:5],
        "last5": per_merge[-5:],
        "rows_final": rows_before_opt,
        "rows_after_optimize": tbl.snapshot().count(),
        "files_after_optimize": len(st["live"]),
        "dv_after_optimize": len(
            {s for a in st["live"].values() for s in a.get("dv", ())}
        ),
        "optimize_sec": opt_sec,
    }
    shutil.rmtree(path, ignore_errors=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf01_x100"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from als_hadoop_spark.session import get_spark

    spark = get_spark("cdc_dv_ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")
    for arm in ("cow", "dv"):
        print(json.dumps(run_arm(spark, sf_dir, arm, n_merges)), flush=True)


if __name__ == "__main__":
    main()
