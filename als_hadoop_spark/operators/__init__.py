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
# order (it checks a prefix of the registry).  Round-10 rotation
# (VERDICT r9 #5): lead with everything r10 re-planned — the
# layout-preserving MERGE/DELETE landed under the whole ACID family,
# blooms changed the state-replay fields, the IVF index grew a
# generation pointer, and q_constraint_audit's FK joins were re-shaped
# — then the OLDEST cohort: the 40 queries whose last driver sample is
# r6 (ALS family, dedup family, sketches, multimodal, curation,
# streaming trio...), several re-planned since.  Pure ordering — the
# dict contents are unchanged.
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # NEW this round (r10) — never driver-sampled
    "q_sql_surface",              # r10: SQL front door MERGE + time travel
    "q_sessionize",               # r10: batch gap sessionization
    # changed this round (r10) — need a driver run on the new form
    "q_acid_merge",               # r10: layout-preserving merge staging
    "q_acid_format_partitioned",  # r10: merge/delete keep elimination
    "q_acid_format",              # r10: blooms + rel-path file discovery
    "q_acid_cdf",                 # r10: bounded AvailableNow admission
    "q_sim_search_ivf_indexed",   # r10: generation pointer + drift stats
    "q_constraint_audit",         # r10: re-shaped FK anti-joins
    "q_acid_incremental",         # rides the merge/delete staging change
    "q_acid_timetravel",          # r6 + state-replay bloom field change
    # oldest driver hashes (r6 cohort, VERDICT r9 #5) — several
    # re-planned since their last sample
    "q_acid_evolution",
    "q_als_fit_predict",
    "q_als_item_sim",
    "q_als_rank_sweep",
    "q_als_ranking",
    "q_als_recommend",
    "q_als_rmse",
    "q_asof_join",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_cms_heavy_hitters",
    "q_curation",
    "q_curation_neardup",
    "q_dedup_cluster",
    "q_dedup_embed",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_doc_fingerprint",
    "q_embed_kmeans",
    "q_embed_pca",
    "q_hll_overlap",
    "q_hll_rollup",
    "q_kll_quantiles",
    "q_lang_id",
    "q_multimodal",
    "q_multimodal_frames",
    "q_nearest_centroid",
    "q_sim_search",
    "q_sim_search_ivfpq",
    "q_sim_search_pq",
    "q_source_overlap",
    "q_stream_join",
    "q_stream_session",
    "q_stream_tumbling",
    "q_text_quality",
    "q_text_stats",
    "q_time_rollup",
    "q_token_topk",
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
