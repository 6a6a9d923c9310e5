"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
partitioned, deterministic ratings generator — the dsdgen/tpch-gen
"benchmark data as a table" pattern, and the engine's demonstration of
the modern extension point for NEW source formats (the reference's
only extension contract was "write another Mapper class",
``ALS-Hadoop/ALS/SharingMapper.java:24-35``; this is the Spark-native
equivalent for sources).

Scale design:

- PLANNING: the source reports one ``InputPartition`` per user shard —
  Spark schedules shards across executors like any file split, so a
  10⁹-user generate parallelizes with zero driver data.
- GENERATION: each shard is produced as ONE pyarrow RecordBatch from
  vectorized numpy (the Arrow fast path of the DataSource API — no
  per-row Python tuples).
- DETERMINISM: rows depend only on (seed, user shard), never on
  partition scheduling — re-running any shard reproduces its bytes
  (the property a resumable 100 TB backfill needs).
- FILTER PUSHDOWN: ``pushFilters`` accepts user_id range/equality
  predicates and PRUNES ENTIRE SHARDS at planning time, returning the
  filters for Spark to re-check (partial pushdown contract); a
  predicate like ``user_id = 7`` plans exactly one partition.

The classes are built inside :func:`build_ratings_gen_source` so
cloudpickle serializes them BY VALUE — a module-level DataSource class
pickles by reference and fails on executors that don't have this
package on PYTHONPATH (exactly the driver's vanilla-session
situation; same discipline as the self-contained pandas_udf closures).

Usage::

    from als_hadoop_spark.sources.generator import register_ratings_gen
    register_ratings_gen(spark)
    df = (spark.read.format("ratings_gen")
          .option("n_users", 1000).option("seed", 42).load())
"""

from __future__ import annotations

#: users per generated shard (one InputPartition each)
USERS_PER_SHARD = 250

SCHEMA_DDL = "user_id INT, item_id INT, rating DOUBLE, ts BIGINT"


def build_ratings_gen_source(with_pushdown: bool = True):
    """Return the RatingsGenSource class (function-local so cloudpickle
    ships it by value to executors). ``with_pushdown=False`` builds a
    variant without ``pushFilters`` for sessions where
    ``spark.sql.python.filterPushdown.enabled`` cannot be turned on
    (Spark refuses a reader that declares pushdown while the flag is
    off)."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    users_per_shard = USERS_PER_SHARD
    schema_ddl = SCHEMA_DDL

    @dataclass
    class Shard(InputPartition):
        lo: int  # first user id in shard (inclusive)
        hi: int  # last user id (exclusive)
        seed: int
        n_items: int
        per_user: int

    class RatingsGenReader(DataSourceReader):
        def __init__(self, options):
            self.n_users = int(options.get("n_users", 1000))
            self.n_items = int(options.get("n_items", 200))
            self.per_user = int(options.get("ratings_per_user", 20))
            self.seed = int(options.get("seed", 42))
            # user_id bounds tightened by pushed-down predicates
            self._lo = 0
            self._hi = self.n_users

        def _push_filters(self, filters):
            for f in filters:
                if getattr(f, "attribute", None) != ("user_id",):
                    yield f  # not ours — Spark evaluates it
                    continue
                if isinstance(f, EqualTo):
                    self._lo = max(self._lo, int(f.value))
                    self._hi = min(self._hi, int(f.value) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self._lo = max(self._lo, int(f.value))
                elif isinstance(f, GreaterThan):
                    self._lo = max(self._lo, int(f.value) + 1)
                elif isinstance(f, LessThan):
                    self._hi = min(self._hi, int(f.value))
                elif isinstance(f, LessThanOrEqual):
                    self._hi = min(self._hi, int(f.value) + 1)
                else:
                    yield f
                    continue
                # partially pushed: shards are pruned here, but Spark
                # re-checks the predicate row-level (exact contract)
                yield f

        def partitions(self):
            lo, hi = self._lo, self._hi
            shards = []
            start = (lo // users_per_shard) * users_per_shard
            for s in range(start, max(hi, start), users_per_shard):
                a, b = max(s, lo), min(s + users_per_shard, hi)
                if a < b:
                    shards.append(Shard(a, b, self.seed, self.n_items, self.per_user))
            # Spark requires >= 1 partition; an empty range yields no rows
            return shards or [Shard(0, 0, self.seed, self.n_items, self.per_user)]

        def read(self, partition):
            import numpy as np
            import pyarrow as pa

            n = (partition.hi - partition.lo) * partition.per_user
            if n == 0:
                yield pa.RecordBatch.from_pydict(
                    {"user_id": [], "item_id": [], "rating": [], "ts": []},
                    schema=pa.schema(
                        [
                            ("user_id", pa.int32()),
                            ("item_id", pa.int32()),
                            ("rating", pa.float64()),
                            ("ts", pa.int64()),
                        ]
                    ),
                )
                return
            # seeded PER SHARD RANGE, so any shard regenerates its
            # exact bytes independent of scheduling
            rng = np.random.default_rng(partition.seed * 1_000_003 + partition.lo)
            users = np.repeat(
                np.arange(partition.lo, partition.hi, dtype=np.int32),
                partition.per_user,
            )
            items = rng.integers(0, partition.n_items, size=n, dtype=np.int32)
            # half-star ratings 0.5..5.0, user/item-biased for ALS realism
            base = (users % 7 + items % 5).astype(np.float64) / 3.0
            noise = rng.normal(0.0, 0.7, size=n)
            rating = np.clip(np.round((base + noise) * 2) / 2, 0.5, 5.0)
            ts = 1_600_000_000_000 + users.astype(np.int64) * 86_400_000 + items
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(users, pa.int32()),
                    pa.array(items, pa.int32()),
                    pa.array(rating, pa.float64()),
                    pa.array(ts, pa.int64()),
                ],
                names=["user_id", "item_id", "rating", "ts"],
            )

    if with_pushdown:
        # attach as an override only when the session allows pushdown —
        # Spark refuses any reader that overrides pushFilters while
        # spark.sql.python.filterPushdown.enabled is false
        RatingsGenReader.pushFilters = RatingsGenReader._push_filters

    from pyspark.sql.datasource import DataSourceStreamReader

    class RatingsGenStreamReader(DataSourceStreamReader):
        """Micro-batch form: the offset is the next ungenerated user
        id; each trigger advances by one shard until ``n_users``.
        partitions(start, end) replays deterministically from offsets
        — the exactly-once contract (a failed batch regenerates its
        exact rows; ``commit`` has nothing to clean up)."""

        def __init__(self, options):
            self.n_users = int(options.get("n_users", 1000))
            self.n_items = int(options.get("n_items", 200))
            self.per_user = int(options.get("ratings_per_user", 20))
            self.seed = int(options.get("seed", 42))

        def initialOffset(self) -> dict:
            return {"next_user": 0}

        def latestOffset(self) -> dict:
            # one shard per micro-batch; capped at the configured corpus
            return {"next_user": self.n_users}

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["next_user"]), int(end["next_user"])
            return [
                Shard(
                    s,
                    min(s + users_per_shard, hi),
                    self.seed,
                    self.n_items,
                    self.per_user,
                )
                for s in range(lo, hi, users_per_shard)
            ] or [Shard(0, 0, self.seed, self.n_items, self.per_user)]

        def read(self, partition):
            # identical generation path as batch — stream == batch by
            # construction
            yield from RatingsGenReader.read(self, partition)

        def commit(self, end: dict) -> None:
            pass  # stateless generator: nothing to release

    class RatingsGenSource(DataSource):
        """``spark.read.format("ratings_gen")`` — see module docstring."""

        @classmethod
        def name(cls) -> str:
            return "ratings_gen"

        def schema(self) -> str:
            return schema_ddl

        def reader(self, schema) -> DataSourceReader:
            return RatingsGenReader(self.options)

        def streamReader(self, schema) -> DataSourceStreamReader:
            return RatingsGenStreamReader(self.options)

    return RatingsGenSource


def register_ratings_gen(spark) -> None:
    """Register the generator under format name ``ratings_gen``,
    enabling Python-source filter pushdown when the session permits
    (falls back to the no-pushdown variant otherwise — results are
    identical, only shard pruning is lost)."""
    conf = "spark.sql.python.filterPushdown.enabled"
    try:
        spark.conf.set(conf, "true")
        pushdown = True
    except Exception:
        pushdown = spark.conf.get(conf, "false") == "true"
    spark.dataSource.register(build_ratings_gen_source(pushdown))
