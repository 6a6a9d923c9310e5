"""User-defined-function surface: the engine's extensibility story
(SURVEY.md §2 Part C closing paragraph).

The reference's extension contract is "write a new Mapper class"
(``ALS-Hadoop/ALS/SharingMapper.java:24-35`` documents exactly that);
the Spark-native analog is the Arrow-backed ``pandas_udf`` family:

- **scalar** pandas_udf: batch-vectorized column function (numpy over
  Arrow batches — the 10-100× faster path vs row-at-a-time Python),
- **grouped-agg** pandas_udf: custom aggregate over a group's Series,
- ``mapInPandas`` / ``applyInPandas``: UDTF-style whole-frame
  transforms (see operators/multimodal.py for the mapInPandas form).

``q_udf_quantize`` exercises the first two on the ``embeddings`` table
with integer-exact arithmetic (int8-style quantization), so despite
running through Python it is fully DuckDB-oracle-checkable — the UDF
surface gets the same correctness gate as built-ins.

Every closure here is self-contained (pickled by value): executors
never need this package on PYTHONPATH.
"""

# NOTE: no `from __future__ import annotations` here — PEP 563 string
# annotations break pandas_udf type inference on the UDF signatures.
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load


def q_udf_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding quantization stats via pandas UDFs: per-vector L1 mass
    of the int8-quantized embedding (scalar pandas_udf, numpy-
    vectorized per Arrow batch), summed per label with a grouped-agg
    pandas_udf. floor(x*127 + 0.5) rounding (not banker's) keeps the
    arithmetic bit-identical to the SQL oracle; all outputs are exact
    integers → hash-stable."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def quant_l1(emb: pd.Series) -> pd.Series:
        import numpy as np

        return emb.map(
            lambda v: int(
                np.abs(np.floor(np.asarray(v, dtype="float64") * 127.0 + 0.5)).sum()
            )
        )

    @pandas_udf("long")
    def sum_agg(s: pd.Series) -> int:  # grouped-agg form: Series -> scalar
        return int(s.sum())

    @pandas_udf("long")
    def count_agg(s: pd.Series) -> int:
        # Spark disallows mixing pandas and non-pandas aggregates in
        # one agg() call, so the row count is a pandas aggregate too.
        return int(len(s))

    emb = load(spark, sf_dir, "embeddings", spread=True)
    return (
        emb.select("label", quant_l1("embedding").alias("l1"))
        .groupBy("label")
        .agg(
            sum_agg("l1").alias("total_l1"),
            count_agg("l1").alias("n_vecs"),
        )
    )


QUERIES = {
    "q_udf_quantize": q_udf_quantize,
}

ORACLES = {
    "q_udf_quantize": """
        SELECT label,
               CAST(SUM(l1) AS BIGINT) AS total_l1,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM (
            SELECT label,
                   list_sum(list_transform(embedding,
                       x -> abs(floor(CAST(x AS DOUBLE) * 127.0 + 0.5)))) AS l1
            FROM embeddings
        )
        GROUP BY label
    """,
}
