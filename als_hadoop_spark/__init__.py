"""als_hadoop_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``KFhga/ALS-hadoop`` (a Hadoop-MapReduce ALS recommender, see
``ALS-Hadoop/ALS/ALS.java``) as an idiomatic Spark DataFrame/SQL engine,
plus the relational, LLM-data-pipeline, and streaming operator surface
described in ``SURVEY.md §2 Part C``.

Layout
------
- ``session``    : SparkSession builder tuned for local + cluster use.
- ``sources``    : table loaders / readers / writers (parquet, csv, json).
- ``functions``  : ids, range joins, vector math, bucketing/salting
                   scale helpers.
- ``operators``  : the query library — relational, ALS, dedup,
                   similarity (exact + bit-sketch + banded LSH + IVF),
                   text analysis, multimodal, time-series, pandas UDFs.
- ``streaming``  : tumbling/session windows (one transform for batch
                   AND streams) + an applyInPandasWithState custom
                   stateful sessionizer.
- ``plans``      : plan-inspection asserts (pushdown, broadcast,
                   no-quadratic-join, shuffle counts).

Every public query takes ``(spark, sf_dir)`` and returns a lazy
``DataFrame`` — no driver-side materialization anywhere in the library
(the reference's single-threaded driver scans at ``ALS/ALS.java:240-245,
274-279, 423-433`` are the anti-pattern this engine eliminates).
"""

__version__ = "0.1.0"
