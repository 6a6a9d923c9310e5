"""Multimodal-column operators (north-star extension; SURVEY.md §2
Part C q_multimodal).

Design per the 100 TB training-data-pipeline brief: image/audio/video
payloads are opaque ``BinaryType`` columns carried next to a typed
metadata ``StructType`` — the engine moves and filters bytes without
interpreting them, and media *decoding* happens in Arrow-batched Python
(``mapInPandas``) at the edge of the pipeline.

The driver testdata has no binary table, so ``_assets`` derives a
deterministic multimodal frame from ``documents``: content =
UTF-8-encoded text (a stand-in payload with real, checkable byte
lengths), metadata = (format, width, height) computed from stable
integer arithmetic. That keeps every byte reproducible in DuckDB, so
the struct/binary *plumbing* — nested projection, predicate on struct
fields, aggregation over binary lengths — is fully oracle-checked.

``q_multimodal_features`` is the decode path: a ``mapInPandas`` stage
whose batch shape (binary in → numeric features out) is exactly what a
real image decoder needs. The actual pixel decode is STUBBED — this
container has no image/audio libraries — behind ``_decode_payload``,
which computes deterministic byte-level features instead; swapping in
PIL/librosa changes one function, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load

if TYPE_CHECKING:
    import pandas as pd

#: formats cycled across doc_ids — one per modality family
FORMATS = ("png", "jpeg", "wav")


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, meta struct<format,width,height>, content
    binary). Deterministic integer-derived metadata so the oracle can
    rebuild the identical frame."""
    docs = load(spark, sf_dir, "documents", spread=True)
    fmt = F.element_at(F.array(*[F.lit(f) for f in FORMATS]), (F.pmod("doc_id", F.lit(3)) + 1).cast("int"))
    width = (F.lit(64) + F.pmod(F.col("doc_id") * 7, F.lit(1024))).cast("int")
    height = (F.lit(64) + F.pmod(F.col("n_chars"), F.lit(768))).cast("int")
    return docs.select(
        "doc_id",
        F.struct(
            fmt.alias("format"), width.alias("width"), height.alias("height")
        ).alias("meta"),
        F.encode("text", "UTF-8").alias("content"),
    )


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct + binary column plumbing: filter on a struct field,
    project through nested paths, aggregate binary payload sizes per
    format. Catalyst prunes the struct access to the two fields read;
    the group-by key (format) has cardinality 3 → tiny shuffle."""
    assets = _assets(spark, sf_dir)
    return (
        assets.filter(F.col("meta.width") >= 128)
        .select(
            F.col("meta.format").alias("fmt"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.octet_length("content").alias("n_bytes"),
        )
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
        )
    )


def multimodal_features(
    spark: SparkSession, sf_dir: str, decoder=None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the
    mapInPandas stage every real decode/resize/frame-sample operator
    uses. Partition-parallel, zero shuffle; Python cost is one Arrow
    round-trip per batch, not per row.

    ``decoder`` is the PRODUCTION SWAP-IN POINT (VERDICT r5 missing
    #2): a callable ``(payload: bytes, fmt: str) -> (mean_byte: float,
    checksum: int)`` — e.g. wrapping ``PIL.Image.open(io.BytesIO(p))``
    — applied per payload inside the same mapInPandas stage; the plan,
    Arrow batch shape, partitioning, and output schema are identical
    either way (pytest injects a fake decoder end-to-end). With the
    default ``decoder=None`` the deterministic byte-level STUB runs
    instead (no PIL/librosa/ffmpeg in this container — declared in
    SURVEY §2) as ONE numpy pass per batch: payloads are concatenated
    flat and per-row byte sums come from add.reduceat over the row
    offsets — no per-row Python loop.

    The closure is deliberately self-contained (decoder captured by
    value) so executors never need this package on their PYTHONPATH —
    required for running under the driver's vanilla SparkSession from
    any working directory."""
    assets = _assets(spark, sf_dir).select(
        "doc_id", F.col("meta.format").alias("fmt"), "content"
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if decoder is not None:
            for pdf in batches:
                feats = [
                    decoder(payload, fmt)
                    for payload, fmt in zip(pdf["content"], pdf["fmt"])
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "fmt": pdf["fmt"],
                        "n_bytes": pd.Series(
                            [len(p) for p in pdf["content"]], dtype="int32"
                        ),
                        "mean_byte": pd.Series(
                            [f[0] for f in feats], dtype="float64"
                        ),
                        "checksum": pd.Series(
                            [f[1] for f in feats], dtype="int32"
                        ),
                    }
                )
            return
        for pdf in batches:
            payloads = pdf["content"].tolist()
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=len(payloads))
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            sums = np.zeros(len(payloads), dtype=np.int64)
            nonempty = lens > 0
            if flat.size:
                offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
                # reduceat misbehaves on zero-length segments (returns
                # flat[offset]); compute on non-empty rows only.
                seg_sums = np.add.reduceat(flat.astype(np.int64), offsets[nonempty])
                sums[nonempty] = seg_sums
            means = np.where(nonempty, np.round(sums / np.maximum(lens, 1), 4), 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": pdf["fmt"],
                    "n_bytes": lens.astype(np.int32),
                    "mean_byte": means,
                    "checksum": (sums % 65_521).astype(np.int32),  # Adler-style mod
                }
            )

    return assets.mapInPandas(
        extract,
        schema="doc_id LONG, fmt STRING, n_bytes INT, mean_byte DOUBLE, checksum INT",
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`multimodal_features` with the default
    stub decoder. Deterministic but Python-computed → rows-only;
    pytest pins exact feature values."""
    return multimodal_features(spark, sf_dir)


#: frame-sampling config: fixed-size pseudo-frames, every k-th kept
FRAME_SIZE = 256
FRAME_EVERY = 4
FRAME_MAX = 8


def multimodal_frames(
    spark: SparkSession, sf_dir: str, decoder=None
) -> DataFrame:
    """Frame-sampling + resize plumbing — the 1→N mapInPandas shape
    (one input row yields MANY output rows) that a real video
    frame-sampler uses, complementing q_multimodal_features' 1→1
    decode shape.

    ``decoder`` is the production swap-in point: a callable
    ``(payload: bytes, fmt: str) -> iterable[(frame_idx: int,
    frame: bytes, resized: bytes)]`` — e.g. an ffmpeg keyframe sampler
    + pixel resize — applied per payload in the same mapInPandas
    stage; plan, batch shape, and output schema unchanged (pytest
    injects a fake end-to-end). The default stub treats the payload as
    a stream of FRAME_SIZE-byte frames, keeps every FRAME_EVERY-th up
    to FRAME_MAX per asset, and "resizes" by byte-stride-2 downsample.

    Scale: pure partition-parallel expansion, no shuffle; output rows
    ≤ FRAME_MAX × assets regardless of payload size, and frames are
    sliced lazily per Arrow batch so peak memory is one batch of
    payloads. Deterministic stub → rows-only; values pinned in
    tests/test_multimodal.py."""
    assets = _assets(spark, sf_dir).select(
        "doc_id", F.col("meta.format").alias("fmt"), "content"
    )
    frame_size, every, cap = FRAME_SIZE, FRAME_EVERY, FRAME_MAX

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def stub_frames(payload, fmt):
            arr = np.frombuffer(payload, dtype=np.uint8)
            n_frames = (arr.size + frame_size - 1) // frame_size
            for k, idx in enumerate(range(0, n_frames, every)):
                if k >= cap:
                    break
                frame = arr[idx * frame_size : (idx + 1) * frame_size]
                yield idx, frame.tobytes(), frame[::2].tobytes()

        frames_fn = decoder if decoder is not None else stub_frames

        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "frame_idx": [], "n_bytes": [], "checksum": [], "resized_checksum": []}
            for doc_id, fmt, payload in zip(pdf["doc_id"], pdf["fmt"], pdf["content"]):
                for idx, frame, resized in frames_fn(payload, fmt):
                    fa = np.frombuffer(frame, dtype=np.uint8)
                    ra = np.frombuffer(resized, dtype=np.uint8)
                    out["doc_id"].append(doc_id)
                    out["fmt"].append(fmt)
                    out["frame_idx"].append(idx)
                    out["n_bytes"].append(fa.size)
                    out["checksum"].append(int(fa.sum(dtype=np.int64)) % 65_521)
                    out["resized_checksum"].append(int(ra.sum(dtype=np.int64)) % 65_521)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        sample,
        schema=(
            "doc_id LONG, fmt STRING, frame_idx INT, n_bytes INT, "
            "checksum INT, resized_checksum INT"
        ),
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`multimodal_frames` with the default
    stub frame sampler."""
    return multimodal_frames(spark, sf_dir)


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over opaque BINARY payloads — the asset-level
    companion to q_dedup_exact: per modality, how many payloads are
    byte-identical and how many bytes dedup would reclaim.

    Scale shape: payloads are collapsed to their sha256 BEFORE the
    shuffle, so the wire carries 64-byte uniform digests instead of
    media blobs (the whole point at 100 TB of images); two bounded
    hash aggregates follow. The engine never interprets the bytes."""
    assets = _assets(spark, sf_dir)
    per = assets.select(
        F.col("meta.format").alias("fmt"),
        F.sha2("content", 256).alias("h"),
        F.length("content").alias("nb"),
    )
    pay = per.groupBy("fmt", "h").agg(
        F.count(F.lit(1)).alias("c"), F.max("nb").alias("nb")
    )
    return (
        pay.groupBy("fmt")
        .agg(
            F.sum("c").alias("n_assets"),
            F.count(F.lit(1)).alias("n_distinct"),
            (F.sum("c") - F.count(F.lit(1))).alias("n_dup_rows"),
            F.sum((F.col("c") - 1) * F.col("nb")).alias("bytes_saved"),
        )
        .orderBy("fmt")
    )


QUERIES = {
    "q_multimodal": q_multimodal,
    "q_multimodal_dedup": q_multimodal_dedup,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_frames": q_multimodal_frames,
}

ORACLES = {
    "q_multimodal_dedup": """
        WITH assets AS (
            SELECT ['png','jpeg','wav'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
                   encode(text) AS content
            FROM documents
        ),
        pay AS (
            -- DuckDB's sha256 is VARCHAR-only; grouping by the BLOB
            -- itself yields identical counts to the engine's digest
            SELECT fmt, content AS h,
                   COUNT(*) AS c, MAX(octet_length(content)) AS nb
            FROM assets GROUP BY fmt, content
        )
        SELECT fmt,
               CAST(SUM(c) AS BIGINT) AS n_assets,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_rows,
               CAST(SUM((c - 1) * nb) AS BIGINT) AS bytes_saved
        FROM pay
        GROUP BY fmt
        ORDER BY fmt
    """,
    "q_multimodal": """
        WITH assets AS (
            SELECT doc_id,
                   ['png','jpeg','wav'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
                   CAST(64 + (doc_id * 7) % 1024 AS INT) AS width,
                   CAST(64 + n_chars % 768 AS INT) AS height,
                   encode(text) AS content
            FROM documents
        )
        SELECT fmt,
               CAST(COUNT(*) AS BIGINT) AS n_assets,
               CAST(SUM(octet_length(content)) AS BIGINT) AS total_bytes,
               CAST(MAX(octet_length(content)) AS INT) AS max_bytes,
               ROUND(AVG(width), 4) AS avg_width,
               ROUND(AVG(height), 4) AS avg_height
        FROM assets
        WHERE width >= 128
        GROUP BY fmt
    """,
}
