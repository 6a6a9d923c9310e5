"""Incremental (streaming) minhash near-dup ingest — the 100 TB ingest
shape of ``operators.dedup.q_dedup_minhash`` (VERDICT r2 stretch #8):
documents arrive as a stream, and each micro-batch is checked against
the banded-minhash index of EVERYTHING seen so far, then folded into
that index. A near-dup is flagged the moment its second copy arrives,
without ever re-scanning the historical corpus.

Mechanics (``foreachBatch`` — the right tool when a streaming stage
needs a batch-only capability, here: joining against and appending to
a persisted index):

1. band the batch's docs with the SAME xxhash64 banded-minhash
   signatures as the batch operator (one shared implementation:
   ``minhash_bands``),
2. probe the persisted band index with the batch's band keys
   (plus the batch itself, for intra-batch pairs) → candidate pairs,
3. exact-jaccard re-rank on the carried shingle arrays, keep
   ``jaccard ≥ NGRAM_JACCARD_T``,
4. append matches to ``<index>/matches``, fold the batch's bands into
   the prefix-partitioned ``<index>/bands`` index.

Batch-vs-index join shape (the part that must survive 100 TB): the
index holds bands = 4 rows × (2 longs + key string) per document —
O(corpus) on DISK, never in memory. Probing it with a SortMergeJoin
would shuffle AND sort the whole index every micro-batch. Instead:

- **the micro-batch side broadcasts** (``F.broadcast(probe)``): a
  micro-batch is bounded by the trigger (maxFilesPerTrigger /
  maxOffsetsPerTrigger), so its banded form is broadcast-sized by
  construction. The historical side streams through a
  BroadcastHashJoin — ZERO shuffle, zero sort, of either side.
- **the index is partitioned by a band-key hash prefix**
  (``band_pfx = xxhash64(band_key) mod BAND_PFX_MOD`` directories).
  Before the join, the batch's distinct prefixes (≤ BAND_PFX_MOD
  values, a bounded collect) become an IN filter that Spark turns
  into directory-level PartitionFilters — a small batch reads only
  the index shards its keys can possibly live in, not the corpus.
  A huge batch degrades gracefully to a full single-pass scan, which
  is the lower bound for any hash join.

Exactly-once: foreachBatch can re-run a batch on failure — idempotence
comes from overwriting a per-batch subdirectory keyed by batch_id
(``bands/batch=N/band_pfx=P/``), so a replayed batch replaces its own
output instead of duplicating it. Compaction of many small per-batch
shards into fewer files per prefix is the same write over the
read-back index (run it with the stream stopped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_BANDS,
    MINHASH_ROWS,
    NGRAM_JACCARD_T,
    _doc_shingles,
    _MINHASH_PRIME,
)

#: number of band-key hash-prefix directories in the persisted index.
#: Sized so one prefix shard of a 100 TB corpus (~bands/256) is still
#: a parallel scan, while a small micro-batch's distinct prefixes
#: prune most directories via PartitionFilters.
BAND_PFX_MOD = 64

_BANDS_SCHEMA = (
    "doc_id LONG, band INT, band_key STRING, shingles ARRAY<STRING>, "
    "band_pfx INT, batch INT"
)


def minhash_bands(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key, shingles) banded-minhash rows for a doc
    frame with a ``text`` column — the per-document half of
    ``operators.dedup.minhash_candidates``, shared by the batch pair
    join and this incremental index. Empty shingle sets produce
    band_key '' and are dropped (an empty doc matches nothing)."""
    sh = _doc_shingles(docs)
    h_idx = list(range(MINHASH_BANDS * MINHASH_ROWS))

    def _mh(i: int) -> F.Column:
        # single-argument lambda on purpose — see minhash_candidates
        return F.array_min(
            F.transform(
                "shingles",
                lambda s: F.pmod(F.xxhash64(s, F.lit(i)), F.lit(_MINHASH_PRIME)),
            )
        )

    sigs = sh.select(id_col, "shingles", *[_mh(i).alias(f"h{i}") for i in h_idx])
    return (
        sigs.select(
            id_col,
            "shingles",
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"h{b * MINHASH_ROWS + r}")
                                for r in range(MINHASH_ROWS)
                            ],
                        )
                        for b in range(MINHASH_BANDS)
                    ]
                )
            ).alias("band", "band_key"),
        )
        .filter(F.col("band_key") != "")
        .select(id_col, "band", "band_key", "shingles")
    )


def band_pfx(band_key: F.Column) -> F.Column:
    """Index-shard id of a band key — the partition directory it lives
    in. Pure JVM hash, identical on the write and probe paths."""
    return F.pmod(F.xxhash64(band_key), F.lit(BAND_PFX_MOD)).cast("int")


def read_band_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The persisted band index with its ``band_pfx``/``batch``
    partition columns recovered from the directory layout."""
    return (
        spark.read.option("basePath", f"{index_dir}/bands")
        .schema(_BANDS_SCHEMA)
        .parquet(f"{index_dir}/bands/*")
    )


def historical_candidates(
    old_bands: DataFrame, new_bands: DataFrame, prefixes: list[int]
) -> DataFrame:
    """Candidate (id_a historical, id_b new) pairs from probing the
    persisted index with a banded micro-batch.

    ``prefixes`` (the batch's distinct ``band_pfx`` values, a
    ≤ BAND_PFX_MOD-element list collected batch-side) prunes index
    directories BEFORE the scan; the batch side broadcasts, so the
    surviving index shards stream through a BroadcastHashJoin with no
    shuffle or sort on either side. Separated from ``neardup_ingest``
    so tests can gate this exact plan shape."""
    probe = new_bands.select(
        F.col("doc_id").alias("id_b"),
        "band",
        "band_key",
        F.col("shingles").alias("sh_b"),
    )
    hist = (
        old_bands.filter(F.col("band_pfx").isin(prefixes))
        .select(
            F.col("doc_id").alias("id_a"),
            "band",
            "band_key",
            F.col("shingles").alias("sh_a"),
        )
    )
    return hist.join(F.broadcast(probe), ["band", "band_key"]).filter(
        F.col("id_a") != F.col("id_b")
    )


def _rerank(cands: DataFrame) -> DataFrame:
    """Exact jaccard over carried shingle arrays; keep ≥ threshold."""
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.select(
            "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= F.lit(NGRAM_JACCARD_T))
    )


def neardup_ingest(docs_stream: DataFrame, index_dir: str):
    """Attach the incremental near-dup stage to a documents stream
    (columns ``doc_id, text``). Returns the DataStreamWriter — caller
    picks trigger/checkpoint and calls ``.start()``.

    Emitted matches (``<index_dir>/matches``): one row
    (id_a, id_b, jaccard, batch_id) per flagged pair, where id_b is
    the NEWLY ARRIVED doc and id_a the historical (or smaller-id
    intra-batch) doc it duplicates."""
    spark = docs_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_bands = (
            minhash_bands(batch_df.select("doc_id", "text"))
            .withColumn("band_pfx", band_pfx(F.col("band_key")))
            .persist()
        )
        try:
            try:
                old_bands = read_band_index(spark, index_dir)
                have_index = True
            except Exception:  # first batch: no index yet
                have_index = False
            sides = []
            if have_index:
                # bounded collect: ≤ BAND_PFX_MOD distinct shard ids
                prefixes = [
                    r[0] for r in new_bands.select("band_pfx").distinct().collect()
                ]
                sides.append(historical_candidates(old_bands, new_bands, prefixes))
            # intra-batch pairs (smaller id plays the historical role);
            # both sides are micro-batch-sized, a plain equi-join
            probe = new_bands.select(
                F.col("doc_id").alias("id_b"),
                "band",
                "band_key",
                F.col("shingles").alias("sh_b"),
            )
            intra = new_bands.select(
                F.col("doc_id").alias("id_a"),
                "band",
                "band_key",
                F.col("shingles").alias("sh_a"),
            )
            sides.append(
                probe.join(intra, ["band", "band_key"]).filter(
                    F.col("id_a") < F.col("id_b")
                )
            )
            cands = sides[0]
            for s in sides[1:]:
                cands = cands.unionByName(s)
            matches = _rerank(
                cands.select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates(
                    ["id_a", "id_b"]
                )
            ).withColumn("batch_id", F.lit(batch_id))
            # per-batch subdirs + overwrite = idempotent on batch replay
            matches.write.mode("overwrite").parquet(
                f"{index_dir}/matches/batch={batch_id}"
            )
            (
                new_bands.write.mode("overwrite")
                .partitionBy("band_pfx")
                .parquet(f"{index_dir}/bands/batch={batch_id}")
            )
        finally:
            new_bands.unpersist()

    return docs_stream.writeStream.foreachBatch(process_batch).outputMode("append")


def read_matches(spark: SparkSession, index_dir: str) -> DataFrame:
    """All near-dup pairs flagged so far (id_a, id_b, jaccard,
    batch_id)."""
    return spark.read.parquet(f"{index_dir}/matches/*")
