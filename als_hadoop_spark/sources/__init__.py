"""Sources & sinks.

The reference's I/O surface (SURVEY.md §2 A1/A15/A16):

- CSV text scan with hard-coded schema      → ``read_ratings_csv``
  (``ALS-Hadoop/ALS/ALS.java:88-93`` splits on ``","`` and casts).
- SequenceFile ``(IntWritable, VectorWritable)`` inter-job storage
  (``ALS/ALS.java:236,269,294``) → superseded by Parquet; ``write_table``
  / ``read_table`` are the engine equivalents.
- Overwrite-before-run (``ALS/ALS.java:75-77``) → ``mode("overwrite")``.
- Text scalar sink ``rmse.txt`` (``ALS/ALS.java:411-419``) → tiny JSON.

All readers take explicit schemas — never ``inferSchema`` (a full extra
scan at 100 TB).
"""

from .acid_cdf import build_acid_cdf_source, register_acid_cdf
from .acid_format import build_acid_format_source, register_acid_format
from .generator import build_ratings_gen_source, register_ratings_gen
from .tables import (
    TABLES,
    load,
    load_all,
    read_json,
    read_jsonl,
    read_orc,
    read_ratings_csv,
    read_table,
    register_views,
    write_clustered,
    write_jsonl,
    write_orc,
    write_table,
    write_zordered,
    zvalue,
)

__all__ = [
    "TABLES",
    "build_acid_cdf_source",
    "build_acid_format_source",
    "build_ratings_gen_source",
    "register_acid_cdf",
    "register_acid_format",
    "register_ratings_gen",
    "load",
    "load_all",
    "read_json",
    "read_jsonl",
    "read_orc",
    "read_ratings_csv",
    "read_table",
    "register_views",
    "write_clustered",
    "write_jsonl",
    "write_orc",
    "write_table",
    "write_zordered",
    "zvalue",
]
