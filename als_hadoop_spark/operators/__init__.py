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
# order (it checks a prefix of the registry).  Round-8 rotation
# (VERDICT r7 #7): lead with everything r8 changed or added — the new
# Structured-Streaming CDC query and the approx profiler, plus the
# ACID/IVM queries whose fold path was refactored (fold_changes, AVG,
# TOCTOU-pinned overwrites) and the ANSI-hardened q_embed_centroid —
# then the oracle-backed queries whose last driver sample is OLDEST
# (the r5 cohort: text/ngrams/market/tpch/timeseries families, green
# since r5's sweep); newer r6/r7 queries close the list in module
# order.  Pure ordering — the dict contents are unchanged.
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # changed/added this round — need a driver run on the new form
    "q_acid_format",            # NEW r8: ACID table as a registered format
    "q_dedup_embed_lsh",        # NEW r8: scale-path embedding dedup
    "q_acid_stream_ivm",        # NEW r8: acid_cdf streaming source + fold
    "q_column_profile_fast",    # NEW r8: one-pass HLL++ profiler (rows-only)
    "q_acid_ivm_loop",          # r8: version-pinned maintainer path
    "q_acid_incremental",       # r8: fold_changes refactor + end pinning
    "q_embed_centroid",         # r8: try_element_at under ANSI
    "q_column_profile",         # exact twin re-proved next to the fast path
    # oldest driver hashes (r5 cohort) — re-verify under the driver
    "q_tfidf",
    "q_pii_scrub",
    "q_lm_score",
    "q_sequence_pack",
    "q_quality_sample",
    "q_sample_mixture",
    "q_mixture_temperature",
    "q_stratified_k",
    "q_volume_shipping",
    "q_market_share",
    "q_returned_items",
    "q_promo_revenue",
    "q_forecast_revenue",
    "q_agg_of_agg",
    "q_having_semijoin",
    "q_exists_chain",
    "q_scalar_threshold_anti",
    "q_contamination",
    "q_doc_repetition",
    "q_ngram_lm",
    "q_pmi_bigrams",
    "q_token_entropy",
    "q_zipf_fit",
    "q_fuzzy_join",
    "q_forward_fill",
    "q_gap_fill",
    "q_interval_merge",
    "q_latest_by_key",
    "q_merge_upsert",
    "q_scd2_history",
    "q_time_weighted_avg",
    "q_udf_arrow",
    "q_udf_groupfit",
    "q_stream_enrich",
    "q_stream_outer_join",
    "q_stream_sliding",
    "q_bitmap_overlap",
    "q_multimodal_dedup",
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
