"""Gates for the format("acid") partitionBy layout (r9, VERDICT r8 #2):
split-by-value writes, log-carried partition values, planning-time
partition ELIMINATION before stats pruning, NULL/encoding edge cases,
vacuum of partition subdirs, and the mixed-layout conservatism."""

import json
import os

import pytest

from als_hadoop_spark.sources import register_acid_format
from als_hadoop_spark.sources.acid import AcidTable
from als_hadoop_spark.sources.acid_format import build_acid_format_source


def _write(spark, path, mode="overwrite", part="cat", rows=None):
    df = spark.createDataFrame(
        rows
        or [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(90)],
        "k LONG, cat STRING, v DOUBLE",
    )
    w = df.repartition(3).write.format("acid").mode(mode)
    if part:
        w = w.option("partitionBy", part)
    w.save(path)


def _planned(spark, path, schema, bounds_filters):
    """Planned InputPartitions for the given pushed filters — the
    plan-level gate the verdict asks for."""
    from pyspark.sql.datasource import EqualTo

    src = build_acid_format_source()(options={"path": path})
    reader = src.reader(schema)
    list(reader._push_filters(bounds_filters))
    return [p for p in reader.partitions() if p.path]


def test_partitioned_write_layout_and_roundtrip(spark, tmp_path):
    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    # directory layout: one dir per value, files only inside them
    assert sorted(d for d in os.listdir(p) if d.startswith("cat=")) == [
        "cat=a",
        "cat=b",
        "cat=c",
    ]
    assert not [n for n in os.listdir(p) if n.endswith(".parquet")]
    # the log action carries exact partition values
    with open(os.path.join(p, "_acid_log", f"{0:010d}.json")) as f:
        entry = json.load(f)
    assert all(a["partition"]["cat"] in "abc" for a in entry["add"])
    # full readback through both readers
    got = spark.read.format("acid").load(p)
    assert got.count() == 90
    assert AcidTable(spark, p).snapshot().count() == 90
    # every partitioned file holds exactly one value (the invariant
    # elimination relies on): footer stats collapse to [v, v]
    assert all(
        a["stats"]["cat"][0] == a["stats"]["cat"][1] == a["partition"]["cat"]
        for a in entry["add"]
    )


def test_partition_elimination_at_planning(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo

    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    got = spark.read.format("acid").load(p)
    live = len(AcidTable(spark, p)._replay())
    parts = _planned(spark, p, got.schema, [EqualTo(("cat",), "b")])
    # only cat=b files planned — exactly one third of the live set
    assert 0 < len(parts) == live // 3
    assert all("cat=b/" in pp.path for pp in parts)
    # and the filtered read agrees with a raw recount
    assert got.filter("cat = 'b'").count() == 30


def test_partition_elimination_stacks_with_stats(spark, tmp_path):
    """Partition elimination runs FIRST, stats pruning refines inside
    the surviving partition (k is range-clustered per task)."""
    from pyspark.sql.datasource import EqualTo, LessThanOrEqual

    register_acid_format(spark)
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a" if i < 500 else "b", float(i)) for i in range(1000)],
        "k LONG, cat STRING, v DOUBLE",
    )
    (
        df.repartitionByRange(4, "k")
        .write.format("acid")
        .mode("overwrite")
        .option("partitionBy", "cat")
        .save(p)
    )
    got = spark.read.format("acid").load(p)
    only_cat = _planned(spark, p, got.schema, [EqualTo(("cat",), "a")])
    both = _planned(
        spark,
        p,
        got.schema,
        [EqualTo(("cat",), "a"), LessThanOrEqual(("k",), 100)],
    )
    assert 0 < len(both) < len(only_cat)
    assert got.filter("cat = 'a' AND k <= 100").count() == 101


def test_partition_null_value_layout_and_elimination(spark, tmp_path):
    from pyspark.sql.datasource import GreaterThan

    register_acid_format(spark)
    p = str(tmp_path / "t")
    rows = [(1, "a", 1.0), (2, None, 2.0), (3, "a", 3.0)]
    _write(spark, p, rows=rows)
    assert "cat=__HIVE_DEFAULT_PARTITION__" in os.listdir(p)
    got = spark.read.format("acid").load(p)
    assert got.count() == 3
    assert got.filter("cat IS NULL").count() == 1
    # NULL satisfies no comparison: any bound on cat eliminates it
    parts = _planned(spark, p, got.schema, [GreaterThan(("cat",), "")])
    assert all("__HIVE_DEFAULT_PARTITION__" not in pp.path for pp in parts)
    assert got.filter("cat > ''").count() == 2


def test_partition_value_percent_encoding(spark, tmp_path):
    register_acid_format(spark)
    p = str(tmp_path / "t")
    rows = [(1, "x/y=z 1", 1.0), (2, "plain", 2.0)]
    _write(spark, p, rows=rows)
    dirs = sorted(d for d in os.listdir(p) if d.startswith("cat="))
    assert dirs == ["cat=plain", "cat=x%2Fy%3Dz%201"]
    got = spark.read.format("acid").load(p)
    assert got.filter("cat = 'x/y=z 1'").count() == 1


def test_mixed_layout_stays_correct(spark, tmp_path):
    """A partitioned append onto an unpartitioned table is CORRECT by
    construction: files without partition metadata are simply never
    partition-eliminated (conservative), and rows always re-check."""
    from pyspark.sql.datasource import EqualTo

    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p, part=None)  # unpartitioned base
    _write(spark, p, mode="append")  # partitioned slice
    got = spark.read.format("acid").load(p)
    assert got.count() == 180
    assert got.filter("cat = 'b'").count() == 60
    parts = _planned(spark, p, got.schema, [EqualTo(("cat",), "b")])
    # unpartitioned files survive only if their stats can't exclude
    # 'b' (they span a..c, so they stay); partitioned ones are exact
    kept_part = [pp for pp in parts if "cat=" in pp.path]
    assert all("cat=b/" in pp.path for pp in kept_part)


def test_vacuum_sweeps_partition_subdirs(spark, tmp_path):
    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    t = AcidTable(spark, p)
    live_before = set(t._replay())
    # orphan a file inside a partition dir (simulated failed job)
    orphan = os.path.join(p, "cat=a", "w-orphan.parquet")
    src = os.path.join(p, sorted(live_before)[0])
    import shutil

    shutil.copyfile(src, orphan)
    os.utime(orphan, (1, 1))  # ancient: outside any retention window
    deleted = t.vacuum(retention_hours=0.0)
    assert "cat=a/w-orphan.parquet" in deleted
    assert set(t._replay()) == live_before
    assert spark.read.format("acid").load(p).count() == 90


def test_partition_errors_are_loud(spark, tmp_path):
    register_acid_format(spark)
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2.5)], "k LONG, f DOUBLE")
    with pytest.raises(Exception, match="not in the written schema"):
        (
            df.write.format("acid")
            .mode("overwrite")
            .option("partitionBy", "nope")
            .save(p)
        )
    with pytest.raises(Exception, match="int/string/bool"):
        (
            df.write.format("acid")
            .mode("overwrite")
            .option("partitionBy", "f")
            .save(p)
        )


def test_in_filter_partition_elimination(spark, tmp_path):
    """col IN (...) prunes partitions to the listed values and keeps
    stats-compatible files elsewhere (r9: the ANN serve path's probe
    read is exactly this shape)."""
    from pyspark.sql.datasource import In

    register_acid_format(spark)
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4], float(i)) for i in range(200)],
        "k LONG, cat STRING, v DOUBLE",
    )
    (
        df.repartition(2)
        .write.format("acid")
        .mode("overwrite")
        .option("partitionBy", "cat")
        .save(p)
    )
    got = spark.read.format("acid").load(p)
    parts = _planned(spark, p, got.schema, [In(("cat",), ("b", "d"))])
    assert parts and all(
        "/cat=b/" in pp.path or "/cat=d/" in pp.path for pp in parts
    )
    assert got.filter(got.cat.isin("b", "d")).count() == 100
    # intersecting a second In narrows further
    parts2 = _planned(
        spark, p, got.schema,
        [In(("cat",), ("b", "d")), In(("cat",), ("d", "a"))],
    )
    assert parts2 and all("/cat=d/" in pp.path for pp in parts2)
    # In on a non-partition column prunes by stats ([mn,mx] misses)
    parts3 = _planned(spark, p, got.schema, [In(("k",), (10_000,))])
    assert len(parts3) == 0 or all(not pp.path for pp in parts3)


def test_optimize_preserves_partition_layout(spark, tmp_path):
    """OPTIMIZE as a table service on a partitioned format path (r9):
    per-partition compaction drops the live-file count, the snapshot is
    hash-identical through the format reader, rewritten files land back
    under their col=value/ dirs with metadata intact, and partition
    elimination still plans only the probed partition afterwards."""
    from pyspark.sql.datasource import EqualTo

    register_acid_format(spark)
    p = str(tmp_path / "t")
    for i in range(4):  # 4 appends × 3 partitions: 12+ small files
        _write(spark, p, mode="append" if i else "overwrite")
    t = AcidTable(spark, p)
    got = spark.read.format("acid").load(p)
    before = sorted(map(tuple, got.collect()))
    n_before = len(t._replay())
    v = t.optimize(target_files=3)
    assert v == t.latest_version()
    live = t._replay()
    assert len(live) < n_before
    assert all(f.split("/")[0].startswith("cat=") for f in live)
    after = sorted(map(tuple, spark.read.format("acid").load(p).collect()))
    assert after == before
    # metadata preserved → elimination still exact
    parts = _planned(
        spark, p, got.schema, [EqualTo(("cat",), "b")]
    )
    assert parts and all("/cat=b/" in pp.path for pp in parts)
    assert len(parts) < len(live)
    # second optimize is a no-op (already compact)
    assert t.optimize(target_files=3) == v


def test_optimize_zorder_within_partitions(spark, tmp_path):
    """cluster_by composes with partitions: rows re-sort WITHIN each
    partition dir and per-file k-ranges become disjoint (stats pruning
    decisive inside the surviving partition)."""
    from pyspark.sql.datasource import EqualTo, LessThanOrEqual

    register_acid_format(spark)
    p = str(tmp_path / "t")
    rows = [(i, ["a", "b"][i % 2], float(i)) for i in range(400)]
    for s in range(4):  # interleaved appends: k ranges overlap per file
        _write(spark, p, mode="append" if s else "overwrite",
               rows=rows[s::4])
    t = AcidTable(spark, p)
    before = sorted(map(tuple,
                        spark.read.format("acid").load(p).collect()))
    t.optimize(target_files=8, cluster_by="k")
    after = sorted(map(tuple,
                       spark.read.format("acid").load(p).collect()))
    assert after == before
    got = spark.read.format("acid").load(p)
    in_part = _planned(spark, p, got.schema, [EqualTo(("cat",), "a")])
    ranged = _planned(
        spark, p, got.schema,
        [EqualTo(("cat",), "a"), LessThanOrEqual(("k",), 40)],
    )
    assert 0 < len(ranged) < len(in_part)  # stats decisive post-service


def test_partition_cardinality_guard(spark, tmp_path):
    """A near-unique partitionBy key refuses loudly (per-task bound):
    over-partitioning is the classic lakehouse failure — millions of
    single-row dirs — and belongs to OPTIMIZE clustering instead."""
    register_acid_format(spark)
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(2000)], "k LONG, fine STRING"
    ).coalesce(1)
    with pytest.raises(Exception, match="too fine-grained"):
        (
            df.write.format("acid")
            .mode("overwrite")
            .option("partitionBy", "fine")
            .save(p)
        )


def _upsert(touched, chg):
    """WHEN MATCHED UPDATE v / WHEN NOT MATCHED INSERT — the canonical
    merge fold for the (k, cat, v) fixture schema."""
    from pyspark.sql import functions as F

    c = chg.select(
        "k",
        F.col("cat").alias("_nc"),
        F.col("v").alias("_nv"),
    )
    j = touched.join(c, "k", "full_outer")
    return j.select(
        "k",
        F.coalesce("_nc", "cat").alias("cat"),
        F.coalesce("_nv", "v").alias("v"),
    )


def test_merge_preserves_partition_layout(spark, tmp_path):
    """VERDICT r9 #1: N copy-on-write MERGEs on a partitionBy table
    must NOT erode planning-time partition elimination — every
    replacement file goes back into its col=value/ dir with the
    partition key on the add action, so the planned InputPartition
    count under a partition predicate stays at the pruned third
    instead of drifting toward all files."""
    from pyspark.sql.datasource import EqualTo

    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    t = AcidTable(spark, p)
    got = spark.read.format("acid").load(p)
    for n in range(4):  # a CDC-style stream of small merges
        changes = spark.createDataFrame(
            [(3 * n, "a", float(1000 + n)), (900 + n, "b", float(n))],
            "k LONG, cat STRING, v DOUBLE",
        )
        t.merge(changes, "k", _upsert)
        # EVERY live file still carries partition metadata in its dir
        live = t._replay()
        assert all(f.split("/")[0].startswith("cat=") for f in live), live
        planned_b = _planned(spark, p, got.schema, [EqualTo(("cat",), "b")])
        assert planned_b, "partition b vanished from the plan"
        assert all("cat=b/" in pp.path for pp in planned_b)
        assert len(planned_b) < len(live)  # elimination still prunes
    # the merges were also CORRECT: updates applied, inserts landed
    snap = {r["k"]: (r["cat"], r["v"]) for r in t.snapshot().collect()}
    assert snap[0] == ("a", 1000.0)  # first merge's update stuck
    assert snap[9] == ("a", 1003.0)  # last merge's update applied
    assert snap[903] == ("b", 3.0)  # last insert present
    assert len(snap) == 90 + 4  # 90 base keys + 4 inserted
    # log actions on the last merge carry partition metadata
    entry = t.history()[-1]
    assert entry["operation"] == "merge"
    assert all(a.get("partition") for a in entry["add"])


def test_delete_preserves_partition_layout(spark, tmp_path):
    """Same gate for copy-on-write DELETE: surviving rows of a touched
    partitioned file land back in their col=value/ dir."""
    from pyspark.sql.datasource import EqualTo

    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    t = AcidTable(spark, p)
    got = spark.read.format("acid").load(p)
    t.delete("v < 9.0")  # touches every partition's files
    live = t._replay()
    assert all(f.split("/")[0].startswith("cat=") for f in live), live
    planned_c = _planned(spark, p, got.schema, [EqualTo(("cat",), "c")])
    assert planned_c and all("cat=c/" in pp.path for pp in planned_c)
    assert len(planned_c) < len(live)
    assert spark.read.format("acid").load(p).count() == 90 - 9
    entry = t.history()[-1]
    assert entry["operation"] == "delete"
    assert all(a.get("partition") for a in entry["add"])


def test_merge_insert_creates_new_partition_dir(spark, tmp_path):
    """A merge inserting rows of a NEVER-SEEN partition value must
    create its col=value/ dir (not dump the rows at the root) and the
    new partition must be exactly plannable."""
    from pyspark.sql.datasource import EqualTo

    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    t = AcidTable(spark, p)
    got = spark.read.format("acid").load(p)
    changes = spark.createDataFrame(
        [(500, "zzz", 1.0), (501, "zzz", 2.0)],
        "k LONG, cat STRING, v DOUBLE",
    )
    t.merge(changes, "k", _upsert)
    assert os.path.isdir(os.path.join(p, "cat=zzz"))
    planned = _planned(spark, p, got.schema, [EqualTo(("cat",), "zzz")])
    assert planned and all("cat=zzz/" in pp.path for pp in planned)
    assert (
        spark.read.format("acid").load(p).filter("cat = 'zzz'").count() == 2
    )


def test_merge_on_mixed_layout_falls_back_to_root(spark, tmp_path):
    """A table whose live set mixes partitioned and root files has no
    single layout to preserve — merge stages at the root (stats-only
    pruning), and reads stay correct (the pinned mixed-layout
    conservatism)."""
    register_acid_format(spark)
    p = str(tmp_path / "t")
    _write(spark, p)
    # root-layout append through the table API (no partition metadata)
    AcidTable(spark, p).append(
        spark.createDataFrame([(700, "d", 7.0)], "k LONG, cat STRING, v DOUBLE")
    )
    t = AcidTable(spark, p)
    t.merge(
        spark.createDataFrame([(700, "d", 77.0)], "k LONG, cat STRING, v DOUBLE"),
        "k",
        _upsert,
    )
    got = {r["k"]: r["v"] for r in t.snapshot().filter("cat = 'd'").collect()}
    assert got == {700: 77.0}
    assert t.snapshot().count() == 91


def test_optimize_with_null_partition_value(spark, tmp_path):
    """ADVICE r9: optimize() on a table holding a NULL partition value
    (and thus mixed NoneType/str sort keys) must not crash — and the
    NULL partition's files must compact back under the Hive sentinel
    dir with metadata intact."""
    register_acid_format(spark)
    p = str(tmp_path / "t")
    rows = [(i, None if i % 3 == 0 else "a", float(i)) for i in range(60)]
    for s in range(3):
        _write(spark, p, mode="append" if s else "overwrite", rows=rows[s::3])
    t = AcidTable(spark, p)
    before = sorted(
        map(tuple, spark.read.format("acid").load(p).collect()),
        key=lambda r: r[0],
    )
    n_before = len(t._replay())
    t.optimize(target_files=2)
    live = t._replay()
    assert len(live) < n_before
    assert any("__HIVE_DEFAULT_PARTITION__" in f for f in live)
    after = sorted(
        map(tuple, spark.read.format("acid").load(p).collect()),
        key=lambda r: r[0],
    )
    assert after == before


def test_merge_with_null_partition_value(spark, tmp_path):
    """The layout-aware merge staging splits with eqNullSafe — a NULL
    partition value routes to the Hive sentinel dir, not a crash or a
    root file."""
    register_acid_format(spark)
    p = str(tmp_path / "t")
    rows = [(i, None if i % 2 else "a", float(i)) for i in range(20)]
    _write(spark, p, rows=rows)
    t = AcidTable(spark, p)
    t.merge(
        spark.createDataFrame([(1, None, 99.0)], "k LONG, cat STRING, v DOUBLE"),
        "k",
        _upsert,
    )
    live = t._replay()
    assert all(f.split("/")[0].startswith("cat=") for f in live)
    snap = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert snap[1] == 99.0 and len(snap) == 20


def test_ntz_timestamp_roundtrips_and_survives_merges(spark, tmp_path):
    """r10 regression (found via the CDC-erosion experiment): a
    TIMESTAMP_NTZ column written through format("acid") must read back
    as TIMESTAMP_NTZ — the default arrow mapping retyped naive footer
    timestamps to tz-aware TimestampType, so the change frame of a
    MERGE carried a different parquet isAdjustedToUTC flag than the
    table's own files and the SECOND merge's mergeSchema read refused
    the table."""
    from pyspark.sql import functions as F

    register_acid_format(spark)
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-06-01 11:30:00")],
        "k LONG, s STRING",
    ).select("k", F.to_timestamp_ntz("s").alias("ts"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    (
        df.coalesce(1)
        .write.format("acid")
        .mode("overwrite")
        .option("partitionBy", "k")
        .save(p)
    )
    got = spark.read.format("acid").load(p)
    assert dict(got.dtypes)["ts"] == "timestamp_ntz"  # faithful type
    assert {r["ts"] for r in got.collect()} == {
        r["ts"] for r in df.collect()
    }  # faithful values (no tz shift)
    t = AcidTable(spark, p)

    def upsert(touched, chg):
        return touched.join(chg.select("k"), "k", "anti").unionByName(chg)

    # two merges whose change frames come from the acid READ — the
    # poisoned-flag scenario: each staged rewrite must keep the flag
    for i in (3, 4):
        c = (
            spark.read.format("acid")
            .load(p)
            .limit(1)
            .withColumn("k", F.lit(i).cast("long"))
        )
        t.merge(c, "k", upsert)
    assert spark.read.format("acid").load(p).count() == 4
    assert t.snapshot().count() == 4
