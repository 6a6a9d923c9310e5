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
# order (it checks a prefix of the registry).  Round-6 rotation
# (VERDICT r5 #2): lead with the round's fixes whose CURRENT form the
# driver has never hash-verified (q_embed_centroid reshaped after its r5
# red; q_dedup_simhash's r5 oracle postdates its last sample;
# q_winnow_dup newly oracle-backed), then the 13 queries never driver-RUN
# in any round (all rows-only by design), then this round's new/changed
# queries; previously-green queries close the list in module order.
# Pure ordering — the dict contents are unchanged.
DRIVER_SAMPLE_PRIORITY: tuple[str, ...] = (
    # fixed/newly-oracled this round — need a driver hash on the new form
    "q_embed_centroid",
    "q_dedup_simhash",
    "q_winnow_dup",
    # never driver-RUN in rounds 1-5 (rows-only by design)
    "q_als_recommend",
    "q_als_item_sim",
    "q_als_ranking",
    "q_als_rank_sweep",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_curation_neardup",
    "q_embed_kmeans",
    "q_embed_pca",
    "q_hll_overlap",
    "q_multimodal_frames",
    "q_sim_search_pq",
    "q_sim_search_ivfpq",
    # new this round (never sampled)
    "q_acid_cdf",
    "q_acid_incremental",
    "q_winnow_dup_fast",
    "q_dedup_simhash_fast",
    # changed this round — re-verify under the driver
    "q_source_overlap",
    "q_acid_merge",
    "q_nearest_centroid",
    "q_acid_evolution",
    "q_acid_timetravel",
    # oracle-backed spot-checks of long-stable families (rotate through
    # queries whose last driver sample is oldest: r2-era)
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_embed",
    "q_sim_search",
    "q_text_stats",
    "q_curation",
    "q_token_topk",
    "q_lang_id",
    "q_text_quality",
    "q_doc_fingerprint",
    "q_multimodal",
    "q_asof_join",
    "q_time_rollup",
    "q_udf_quantize",
    "q_udf_chunk",
    "q_stream_tumbling",
    "q_stream_session",
    "q_stream_join",
    # rows-only spot-checks (weaker rows-only driver check)
    "q_dedup_minhash",
    "q_dedup_cluster",
    "q_hll_rollup",
    "q_kll_quantiles",
    "q_cms_heavy_hitters",
    "q_als_fit_predict",
    "q_als_rmse",
    "q_sim_search_lsh",
    "q_sim_search_ivf",
    "q_multimodal_features",
    "q_random_split",
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
