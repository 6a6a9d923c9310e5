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
# order (it checks a prefix of the registry).  Round-9 rotation
# (VERDICT r8 #5): lead with the commit-path-touched ACID family (the
# atomic link-publish + TOCTOU-free rebase landed under all of them)
# and the two r9 additions, then the queries whose last driver sample
# is OLDEST — q_sim_search_lsh / q_sim_search_ivf / q_multimodal_features
# (r2) and the nine r4-cohort queries (several re-planned since their
# last sample).  Pure ordering — the dict contents are unchanged.
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # changed/added this round — need a driver run on the new form
    "q_acid_format_partitioned",  # NEW r9: partitionBy layout + elimination
    "q_sim_search_ivf_indexed",   # NEW r9: persisted IVF index (rows-only)
    "q_acid_format",              # r9: atomic publish + TOCTOU-free commit
    "q_acid_merge",               # r9: link-publish under MERGE commits
    "q_acid_cdf",                 # r9: CDF guard cache + entry memo
    "q_acid_stream_ivm",          # r9: streaming sink over the new commit
    "q_acid_ivm_loop",            # r9: maintainer loop over the new commit
    "q_dedup_embed_lsh",          # r9: trailing global sort dropped
    # oldest driver hashes — re-verify under the driver
    "q_sim_search_lsh",           # last sampled r2
    "q_sim_search_ivf",           # last sampled r2
    "q_multimodal_features",      # last sampled r2
    "q_approx_count_distinct",    # r4 cohort
    "q_random_split",
    "q_approx_percentile",
    "q_constraint_audit",
    "q_event_funnel",
    "q_cohort_retention",
    "q_trailing_window",
    "q_regression",
    "q_outer_join_count",
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
