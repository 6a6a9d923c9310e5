"""Dense-id assignment at scale (reference A7).

The reference densifies ids in one Python process with an in-memory set
(``ALS-Hadoop/mapid.py:28-38``) — O(distinct) driver RAM, the classic
non-distributed anti-pattern. The obvious Spark rewrite,
``dense_rank() OVER (ORDER BY key)``, is just as bad at 100 TB: an
unpartitioned window funnels every distinct key through ONE task.

``dense_ids`` instead does a three-step distributed enumeration:

1. ``distinct`` + ``repartitionByRange(key)`` + ``sortWithinPartitions``
   — keys globally sorted across partitions (partition *p*'s keys all
   precede partition *p+1*'s).
2. per-partition local enumeration with ``mapInPandas`` (Arrow-batched,
   a running counter per partition — no shuffle, no window).
3. per-partition counts → cumulative offsets (a #partitions-row
   driver-side cumsum — bounded by the partition count, never by data
   size) broadcast-joined back: ``dense_id = offset[pid] + local_idx``.

The result is bit-identical to ``dense_rank()-1`` ordered by key, while
every step stays O(rows/partitions) per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_ids(df: DataFrame, key: str, num_partitions: int | None = None) -> DataFrame:
    """Return a mapping DataFrame ``(key, dense_id: long)`` where
    ``dense_id`` is the 0-based rank of ``key`` in global sort order."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    distinct = (
        df.select(key)
        .distinct()
        .repartitionByRange(num_partitions, key)
        .sortWithinPartitions(key)
        .withColumn("_pid", F.spark_partition_id())
    )

    key_type = dict(df.dtypes)[key]
    out_schema = f"{key} {key_type}, _pid INT, _local_idx BIGINT"

    def enumerate_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    key: pdf[key],
                    "_pid": pdf["_pid"],
                    "_local_idx": range(seen, seen + n),
                }
            )
            seen += n

    enumerated = distinct.mapInPandas(enumerate_partition, schema=out_schema)
    # Cache: both the offsets aggregation and the final join consume it.
    enumerated = enumerated.persist()

    counts = enumerated.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, running = [], 0
    for row in counts:
        offsets.append((row["_pid"], running))
        running += row["count"]
    offsets_df = spark.createDataFrame(offsets, "_pid INT, _offset BIGINT")

    return (
        enumerated.join(F.broadcast(offsets_df), "_pid")
        .select(key, (F.col("_offset") + F.col("_local_idx")).alias("dense_id"))
    )
