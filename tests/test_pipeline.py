"""End-to-end test of the composed curation pipeline
(operators/pipeline.py): documents in, partitioned training JSONL +
manifest out, with the cross-stage invariants a production run relies
on."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from als_hadoop_spark.operators.pipeline import curate_and_pack
from als_hadoop_spark.operators.text import MIXTURE_RATES, PACK_CAP


def test_curate_and_pack_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    manifest = {r["lang"]: r for r in curate_and_pack(spark, sf_dir, out).collect()}
    assert manifest, "empty manifest"

    # sink is partitioned by lang and readable back
    part_dirs = sorted(glob.glob(f"{out}/lang=*"))
    assert [d.split("lang=")[1] for d in part_dirs] == sorted(manifest)
    back = spark.read.json(f"{out}/lang=*", multiLine=False)

    # manifest reconciles exactly with the written data
    assert back.count() == sum(r["n_docs"] for r in manifest.values())
    got_tokens = back.agg(F.sum("n_tokens")).collect()[0][0]
    assert got_tokens == sum(r["total_tokens"] for r in manifest.values())

    # curation really happened: no exact duplicate texts survive
    n = back.count()
    assert back.select(F.sha2("text", 256)).distinct().count() == n

    # mixture really happened: downsampled langs kept fewer docs than
    # the corpus holds (pick the most aggressively downsampled lang)
    lang, r = min(MIXTURE_RATES.items(), key=lambda kv: kv[1])
    if lang in manifest and r < 1.0:
        from als_hadoop_spark.sources import load

        total = (
            load(spark, sf_dir, "documents").filter(F.col("lang") == lang).count()
        )
        assert manifest[lang]["n_docs"] < total

    # packing really happened: bins are dense per shard and fill is
    # sane (every doc got a bin; bin token sums exceed CAP only via a
    # doc straddling the boundary)
    assert back.filter(F.col("bin_id").isNull()).count() == 0
    per_bin = (
        back.groupBy("shard", "bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for r_ in per_bin:
        assert r_["t"] < PACK_CAP + r_["mx"], r_

    # deterministic: a second run into a fresh dir yields the same manifest
    again = {
        r["lang"]: r
        for r in curate_and_pack(spark, sf_dir, str(tmp_path / "out2")).collect()
    }
    assert {k: tuple(v) for k, v in again.items()} == {
        k: tuple(v) for k, v in manifest.items()
    }


def test_packed_sink_prunes_on_shard_and_bin(spark, tmp_path):
    """The optional z-ordered packed sink must reconcile exactly with
    the JSONL export AND make BOTH loader access patterns selective:
    a single shard (data-parallel rank) and a bin range (curriculum
    stage) each touch a minority of the written files. sf0.01 + a
    small pack_cap on purpose: at the default 2048-token cap the test
    corpus fits one bin per shard, degenerating the bin dimension."""
    from tests.conftest import SF_DIR_MID

    out = str(tmp_path / "out")
    packed = str(tmp_path / "packed")
    manifest = {
        r["lang"]: r
        for r in curate_and_pack(
            spark, SF_DIR_MID, out, packed_dir=packed, pack_cap=128
        ).collect()
    }
    pdf = spark.read.parquet(packed)
    assert pdf.count() == sum(r["n_docs"] for r in manifest.values())

    def files_touched(cond) -> int:
        return (
            pdf.filter(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    total = pdf.select(F.input_file_name().alias("f")).distinct().count()
    max_bin = pdf.agg(F.max("bin_id")).collect()[0][0]
    by_shard = files_touched(F.col("shard") == 0)
    by_bin = files_touched(F.col("bin_id") <= max_bin / 8)
    assert by_shard <= total * 0.6, (by_shard, total)
    assert by_bin <= total * 0.6, (by_bin, total)
