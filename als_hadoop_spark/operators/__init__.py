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
    sketches,
    text,
    ngrams,
    pca,
    multimodal,
    timeseries,
    udfs,
)


# Registration order doubles as the external correctness harness's sample
# order (it checks a prefix of the registry).  Round-7 rotation
# (VERDICT r6 #8): lead with everything r7 changed or added — the
# renamed fast/oracle twins (all four need a driver run in their NEW
# roles), the reshaped q_embed_centroid, the re-planned
# q_transpose_regroup, and the new q_gen_scan — then the oracle-backed
# queries whose last driver sample is OLDEST (the r4 cohort:
# relational/analytics/tpch families, untouched since r4's sweep);
# previously-green r5/r6 queries close the list in module order.
# Pure ordering — the dict contents are unchanged.
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # changed/added this round — need a driver run on the new form
    "q_dedup_simhash",          # now the xxhash64 production plan (rows-only)
    "q_winnow_dup",             # now the rolling-hash production plan (rows-only)
    "q_dedup_simhash_oracle",   # md5 hash-proof under its new name
    "q_winnow_dup_oracle",      # md5 hash-proof under its new name
    "q_embed_centroid",         # r7: no pre-aggregate explode
    "q_transpose_regroup",      # r7: direct plan, naive map moved to oracle
    "q_gen_scan",               # r7: custom Python DataSource surface
    "q_acid_incremental",       # exercised the r7-extended refresh path
    "q_acid_ivm_loop",          # r7: maintained-rollup loop, new oracle
    # oldest driver hashes (r4 cohort) — re-verify under the driver
    "q_scan_project",
    "q_filter",
    "q_groupby_sum",
    "q_avg_per_key",
    "q_count_distinct",
    "q_rollup_cube",
    "q_broadcast_join",
    "q_shuffle_join",
    "q_salted_join",
    "q_semi_anti_join",
    "q_range_join",
    "q_window_rank",
    "q_window_running",
    "q_topk",
    "q_set_ops",
    "q_listagg",
    "q_scalar_funcs",
    "q_array_map_json",
    "q_variant_json",
    "q_array_funcs",
    "q_pivot",
    "q_percentiles",
    "q_stats_agg",
    "q_dense_ids",
    "q_rmse",
    "q_correlated_subquery",
    "q_window_distribution",
    "q_null_semantics",
    "q_safe_casts",
    "q_hash_split",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_funnel_latency",
    "q_equifreq_bins",
    "q_event_transitions",
    "q_order_revenue_topn",
    "q_column_profile",
    "q_nation_volume",
    "q_histogram",
    "q_outliers",
    "q_skew_profile",
    "q_constraint_audit",
    "q_event_funnel",
    "q_cohort_retention",
    "q_trailing_window",
    "q_regression",
    "q_outer_join_count",
    "q_asof_join",
    "q_time_rollup",
    "q_multimodal",
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
