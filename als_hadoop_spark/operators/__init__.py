"""Operator library — every query surface from SURVEY.md §2 Part C.

Each submodule exports ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL twins; a query missing
from ORACLES is deliberately rows-only — sketches, LSH, random splits,
ML fits).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    als,
    analytics,
    ann_index,
    bpe,
    dedup,
    fuzzy,
    market,
    multimodal,
    ngrams,
    pca,
    relational,
    similarity,
    sketches,
    text,
    timeseries,
    tpch,
    udfs,
)

_MODULES = (
    relational,
    analytics,
    tpch,
    market,
    bpe,
    fuzzy,
    als,
    dedup,
    similarity,
    ann_index,
    sketches,
    text,
    ngrams,
    pca,
    multimodal,
    timeseries,
    udfs,
)


# Registration order doubles as the external correctness harness's sample
# order (it checks a prefix of the registry).  Round-11 rotation
# (VERDICT r10 #6): lead with the r11 additions (deletion vectors),
# then everything the r11 acid.py/sql.py changes re-planned — the DV
# anti-join sits under every ACID read path and q_acid_merge switched
# to merge-on-read — then the OLDEST cohort: the 18 queries whose last
# driver sample is r6/r7.  Pure ordering — the dict contents are
# unchanged.
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # NEW this round (r11) — never driver-sampled
    "q_acid_dv",                  # r11: DV masks + SQL DELETE/UPDATE
    # changed this round (r11) — need a driver run on the new form
    "q_acid_merge",               # r11: merge-on-read (sidecar commit)
    "q_sql_surface",              # r11: front door grew DELETE/UPDATE
    "q_acid_cdf",                 # rides the DV-aware _assemble
    "q_acid_format",              # r11: format reader masks positions
    "q_acid_format_partitioned",  # r11: DV x partition elimination
    "q_acid_incremental",         # rides the DV-aware read path
    "q_acid_timetravel",          # rides the DV-aware state replay
    "q_acid_evolution",           # rides the DV-aware epoch grouping
    "q_acid_ivm_loop",            # rides the DV-aware merge path
    "q_acid_stream_ivm",          # rides the DV-aware merge path
    # oldest driver hashes (r6/r7 cohort, VERDICT r10 #6)
    "q_correlated_subquery",
    "q_dedup_simhash",
    "q_dedup_simhash_oracle",
    "q_equifreq_bins",
    "q_event_transitions",
    "q_funnel_latency",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_histogram",
    "q_nation_volume",
    "q_order_revenue_topn",
    "q_outliers",
    "q_rmse",
    "q_skew_profile",
    "q_udf_chunk",
    "q_udf_quantize",
    "q_winnow_dup",
    "q_winnow_dup_oracle",
)


def order_for_driver(
    qs: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Reorder a merged query registry so DRIVER_SAMPLE_PRIORITY leads."""
    head = {k: qs[k] for k in DRIVER_SAMPLE_PRIORITY if k in qs}
    head.update((k, v) for k, v in qs.items() if k not in head)
    return head


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
