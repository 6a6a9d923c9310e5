"""Table loaders for the driver's synthetic star schema + engine readers/writers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: the ten driver tables (TESTDATA.md); one parquet file each under sf_dir.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: ratings CSV schema — the reference's sole logical input record,
#: parsed at ALS-Hadoop/ALS/ALS.java:90-93 (comma split, int/int/float).
RATINGS_SCHEMA = "user_id INT, item_id INT, rating FLOAT"


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | int = False
) -> DataFrame:
    """Read one driver table. Parquet scan → vectorized reader, column
    pruning and predicate pushdown apply automatically downstream.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark 4
    has no timestamp type for (µs max). With
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as a
    ns-since-epoch long; we floor-divide to µs with *integer* `div`
    (a double division would lose precision above 2^53) and rebuild the
    timestamp — matching DuckDB's own ns→µs truncation, per the
    FIXTURES.md precision note."""
    if name == "events":
        # Runtime-settable SQL conf; applied here too (not only in
        # session.py) so the engine works under ANY caller-provided
        # SparkSession, e.g. the driver's vanilla one.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Floor division via (ts - pmod(ts, 1000)) div 1000: `div`
            # alone truncates toward zero, which differs from floor for
            # PRE-epoch (negative) nanos — this form matches DuckDB's
            # ns→µs floor on the whole timestamp range, not just the
            # post-epoch data the fixtures happen to contain.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
            )
        elif ts_type == "timestamp_ntz":
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives
            # as TIMESTAMP_NTZ, which instant-based functions
            # (unix_micros, window, watermarks) reject. Pin the naive
            # wall time to UTC — explicitly, NOT via a bare
            # cast('timestamp') which would re-interpret the value in
            # the session timezone and make results cluster-dependent.
            # Matches DuckDB, whose TIMESTAMP comparisons treat the
            # same naive value as-is.
            df = df.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    if spread:
        # The driver's testdata files hold a SINGLE parquet row group,
        # so a scan stage runs as one task no matter the split config —
        # and any expensive per-row work fused into it (HOF shingling,
        # sketch UDFs, Arrow batches) runs single-threaded. Operators
        # with heavy compute per row opt into one up-front round-robin
        # shuffle to use every core. Production multi-row-group files
        # parallelize at the scan and don't need this.
        #
        # Pass an int to pin the count: Arrow/Python stages over SMALL
        # tables want FEW, LARGE batches — per-task Python overhead
        # dominates tiny ones (pandas_udf over 2k rows: 32 partitions
        # 2.8 s vs 8 partitions 0.6 s).
        n = spread if isinstance(spread, int) and spread is not True else None
        df = df.repartition(n or spark.sparkContext.defaultParallelism)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV ratings scan — engine twin of the reference's text parse
    (ALS-Hadoop/ALS/ALS.java:88-93; python analog mapid.py:17-24).

    Explicit schema (no inference pass), no header, comma-delimited,
    extra columns (the MovieLens timestamp, dropped at mapid.py:21)
    ignored via mode=DROPMALFORMED being unnecessary — schema projection
    keeps only the first three columns.
    """
    return (
        spark.read.schema(RATINGS_SCHEMA)
        .options(header="false", mode="PERMISSIVE")
        .csv(path)
        .dropna(subset=["user_id", "item_id", "rating"])
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with explicit schema (no inference pass — at
    100 TB an inference scan is a full extra read). Nested fields come
    back as StructType columns; pair with ``F.from_json`` for JSON
    embedded in string columns (see relational.q_array_map_json)."""
    return spark.read.schema(schema).json(path)


def read_table(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Engine twin of the reference's SequenceFile source
    (ALS-Hadoop/ALS/ALS.java:261,286,366): columnar Parquet instead of
    binary KV pairs.

    ``merge_schema=True`` reconciles files written under EVOLVED
    schemas (columns added over time): the unified schema is the union
    of all file footers, missing columns read as NULL. Off by default
    — footer merging is an extra file-listing pass a 100 TB scan
    shouldn't pay when the schema is known stable."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Engine twin of the reference's SequenceFile sink + overwrite
    semantics (ALS-Hadoop/ALS/ALS.java:236 et al., delete-if-exists at
    75-77). Partitioned Parquet so downstream scans prune files."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """JSONL export sink — the interchange format LLM training
    pipelines hand to tokenizers. Spark's json writer emits one JSON
    object per line per part file (i.e. JSONL), embarrassingly
    parallel; nested structs/arrays (multimodal metadata, embeddings)
    serialize naturally. Gzip by default: JSONL compresses ~10× and
    every downstream loader reads .jsonl.gz. Partitioning (e.g. by
    lang) gives the mixture-sampling stage file-level pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSONL source. Pass an explicit schema string to skip the
    inference scan (mandatory at 100 TB — inference reads the data
    twice) and to keep types stable when a batch happens to contain
    only nulls in some field."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink — Spark's second native columnar format (zlib by
    default), for interop with Hive/Trino warehouses that standardize
    on ORC. Same pruning/pushdown story as parquet: partition
    directories + min/max stripe statistics."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (vectorized reader; filter pushdown + column pruning
    apply exactly as for parquet)."""
    return spark.read.orc(path)


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Layout-optimizing sink: partition directories for coarse
    file-level pruning PLUS range-clustered, sorted files so parquet
    row-group min/max statistics prune within each partition — the
    ZORDER/cluster-by story for a 100 TB table without a table format.

    ``repartitionByRange`` over (partition cols, cluster cols) gives
    each task a contiguous key range (one range-shuffle, sampled
    bounds), and ``sortWithinPartitions`` orders rows inside each file,
    so every written file covers a NARROW, largely disjoint interval of
    the cluster columns. A reader filtering on a cluster column then
    skips whole files/row groups by footer stats alone — the same scan
    does no extra work at write time beyond the one range exchange.
    ``n_buckets`` bounds files per partition directory (small-file
    control: compaction is the same call over the read-back table)."""
    out = (
        df.repartitionByRange(n_buckets, *partition_by, *cluster_by)
        .sortWithinPartitions(*partition_by, *cluster_by)
    )
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


#: z-curve resolution: 16 bits per dimension → 32-bit z-values
_Z_BITS = 16


def zvalue(x: Column, y: Column) -> Column:
    """Morton (Z-order) key of two 16-bit-normalized ints — pure JVM
    bit arithmetic (a chain of shift/or expressions, no UDF): bit i of
    x lands at position 2i, bit i of y at 2i+1, so sorting by the
    result interleaves both dimensions' locality."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame, col_x: str, col_y: str, n_files: int = 16
) -> DataFrame:
    """The z-order TRANSFORM behind ``write_zordered`` (and
    ``AcidTable.optimize(zorder_by=...)``): returns ``df`` range-
    partitioned and sorted on the Morton interleave of the two
    rank-normalized columns, ready for any sink. See write_zordered
    for the layout rationale."""
    stats = df.agg(
        F.min(col_x).alias("_xlo"),
        F.max(col_x).alias("_xhi"),
        F.min(col_y).alias("_ylo"),
        F.max(col_y).alias("_yhi"),
    )
    scaled = df.crossJoin(F.broadcast(stats))

    def norm(c: str, lo: str, hi: str) -> Column:
        # guard ONLY the degenerate constant-column case (span = 0);
        # clamping every sub-1 span — e.g. a score column in [0, 0.01]
        # — would collapse that dimension's bits and silently degrade
        # the curve to linear on the other column
        raw_span = (F.col(hi) - F.col(lo)).cast("double")
        span = F.when(raw_span == 0, F.lit(1.0)).otherwise(raw_span)
        return (
            ((F.col(c) - F.col(lo)) / span * ((1 << _Z_BITS) - 1))
            .cast("long")
        )

    return (
        scaled.withColumn(
            "_z", zvalue(norm(col_x, "_xlo", "_xhi"), norm(col_y, "_ylo", "_yhi"))
        )
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_xlo", "_xhi", "_ylo", "_yhi", "_z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional layout sink — the ZORDER story
    ``write_clustered`` can't give: linear clustering makes ONE column
    prunable and leaves every other filter touching all files; the
    Morton curve trades a little locality on each dimension for
    locality on BOTH, so each written file covers an approximately
    square region of (x, y) space and a selective predicate on EITHER
    column skips most files via parquet footer min/max stats.

    Both columns are rank-normalized to 16-bit via their min/max (one
    1-row aggregate broadcast back — no collect), bit-interleaved
    JVM-side, then range-partitioned and sorted on the z-value: one
    range exchange at write time, same as the linear writer.
    ``tests/test_sources.py`` measures the actual file-skip counts on
    both dimensions against the linear layout."""
    zorder_layout(df, col_x, col_y, n_files).write.mode(mode).parquet(path)
