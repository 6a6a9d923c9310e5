"""Memory-pressure datum (VERDICT r8 stretch #8): run the heaviest
×100 queries under a CONSTRAINED heap (default 16 GiB vs the sandbox's
128 GiB) and record wall time plus shuffle/aggregation SPILL bytes —
the 128 GiB sandbox hides spill cliffs a real per-executor budget hits.

Spill is harvested from the Spark event log (SparkListenerTaskEnd →
Task Metrics → memory/disk bytes spilled summed per query's jobs), the
same numbers the UI's stage page shows. Usage:

    python scripts/bench_memory_pressure.py [--mem 16g] [query ...]

Prints one markdown table row per query: wall seconds, memory spill,
disk spill, status — the BASELINE.md evidence block.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf01_x100")
DEFAULT = [
    "q_graph_pagerank",
    "q_fuzzy_join",
    "q_winnow_dup_oracle",
    "q_source_overlap",
    "q_dedup_ngram",
]


def _spill_since(log_dir: str, marks: dict[str, int]) -> tuple[int, int]:
    """Sum task-level spill bytes appended to any event log since the
    per-file offsets in ``marks`` (updated in place)."""
    mem = disk = 0
    for name in os.listdir(log_dir):
        p = os.path.join(log_dir, name)
        if not os.path.isfile(p):
            continue
        start = marks.get(p, 0)
        with open(p, "rb") as f:
            f.seek(start)
            chunk = f.read()
        marks[p] = start + len(chunk)
        for line in chunk.decode("utf-8", "replace").splitlines():
            if '"SparkListenerTaskEnd"' not in line:
                continue
            try:
                m = json.loads(line).get("Task Metrics") or {}
            except json.JSONDecodeError:
                continue
            mem += int(m.get("Memory Bytes Spilled", 0))
            disk += int(m.get("Disk Bytes Spilled", 0))
    return mem, disk


def main(argv: list[str]) -> int:
    mem_cap = "16g"
    names = []
    it = iter(argv)
    for a in it:
        if a == "--mem":
            mem_cap = next(it)
        else:
            names.append(a)
    names = names or DEFAULT

    import tempfile

    from pyspark.sql import SparkSession

    log_dir = tempfile.mkdtemp(prefix="spark_evlog_")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", mem_cap)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.ui.enabled", "false")
        .appName("bench_memory_pressure")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    marks: dict[str, int] = {}
    print(f"heap {mem_cap}, sf_dir {SF_DIR}")
    print("| query | wall (s) | mem spill | disk spill | status |")
    print("|---|---|---|---|---|")
    for name in names:
        _spill_since(log_dir, marks)  # advance past setup noise
        t0 = time.perf_counter()
        status = "ok"
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # noqa: BLE001 — the failure IS the datum
            status = f"FAIL {type(ex).__name__}: {str(ex)[:80]}"
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            rdd.unpersist(False)
        time.sleep(1)  # let the event log flush task ends
        mem, disk = _spill_since(log_dir, marks)
        gb = 1 << 30
        print(
            f"| {name} | {dt:.1f} | {mem/gb:.2f} GiB | {disk/gb:.2f} GiB "
            f"| {status} |",
            flush=True,
        )
    spark.stop()
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
