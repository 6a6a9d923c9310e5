"""End-to-end training-data pipeline — the composed product the
individual operators exist for: raw documents in, training-ready
partitioned JSONL out.

    quality filter → exact dedup → minhash near-dup keep-one
    → deterministic per-language mixture sampling
    → token counting + sequence-pack bin assignment
    → JSONL export partitioned by lang
    → per-language manifest (docs, tokens, bins) returned

This is the switch-over artifact for a user of the reference: where the
reference chains 23 MapReduce job launches with HDFS round-trips
between them (SURVEY.md §3.1), every stage here is ONE lazy Catalyst
plan up to the single write — the filter fuses into the scan, dedup is
one hash shuffle, near-dup candidates are an equi-join on band keys,
the mixture predicate is per-row integer arithmetic (pushdown-safe),
and packing is a sharded window cumsum. Nothing materializes until the
sink.

Scale notes: the export partitions by lang (file-level pruning for
mixture-specific reads downstream); JSONL is the tokenizer-facing
interchange format (gzip in production — plain here so tests can
inspect); the returned manifest is a bounded-key aggregate, the only
thing the driver ever holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from ..sources.tables import write_jsonl
from .text import (
    _KNUTH,
    _MOD31,
    MIXTURE_RATES,
    PACK_CAP,
    PACK_SHARDS,
    curate_neardup_docs,
)


def curate_and_pack(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    packed_dir: str | None = None,
    pack_cap: int = PACK_CAP,
) -> DataFrame:
    """Run the full curation DAG over ``{sf_dir}/documents.parquet``,
    write training-ready JSONL under ``out_dir`` (partitioned by
    lang), and return the per-language manifest
    (lang, n_docs, total_tokens, n_bins, avg_quality).

    ``packed_dir`` (optional) additionally writes the packed rows as a
    Z-ORDERED parquet table on (shard, bin_id) — the layout a training
    loader wants: a data-parallel rank pulls its shard, a curriculum
    stage pulls a bin range, and EITHER predicate skips most files via
    parquet footer min/max stats (``sources.tables.write_zordered``;
    the measured skip counts are in tests/test_pipeline.py). The JSONL
    sink stays lang-partitioned for mixture-specific reads; the packed
    sink serves the by-shard/by-bin access pattern JSONL directories
    can't."""
    docs = load(spark, sf_dir, "documents", spread=True)
    kept = curate_neardup_docs(docs)

    # deterministic mixture sampling — same Knuth-hash predicate as
    # q_sample_mixture: auditable, layout-independent, pushdown-safe
    u = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_MOD31)) * F.lit(_KNUTH), F.lit(_MOD31)
    ) / F.lit(float(_MOD31))
    rate = F.lit(1.0)
    for lang, r in MIXTURE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    sampled = kept.filter(u < rate)

    # token counts + sequence-pack bin assignment (q_sequence_pack
    # semantics: sharded stream-concat, doc lands in the bin holding
    # its last token)
    from pyspark.sql import Window

    toks = sampled.select(
        "doc_id",
        "lang",
        "text",
        F.round("q", 4).alias("quality"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.pmod("doc_id", F.lit(PACK_SHARDS)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pack_cap is a training config (sequence length budget per bin),
    # not an engine constant — callers override it per run
    packed = toks.withColumn(
        "bin_id", F.floor((F.sum("n_tokens").over(w) - 1) / pack_cap)
    )

    export_cols = packed.select(
        "doc_id", "lang", "text", "quality", "n_tokens", "shard", "bin_id"
    )
    write_jsonl(
        export_cols,
        out_dir,
        partition_by=["lang"],
        compression=None,  # plain for inspectability; gzip in production
    )
    if packed_dir is not None:
        from ..sources.tables import write_zordered

        write_zordered(export_cols, packed_dir, "shard", "bin_id")

    # manifest from the same plan (not a re-read of the sink)
    manifest = packed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("shard", "bin_id").alias("n_bins"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    return manifest.orderBy("lang")
