"""Value pins for the multimodal Python-path operators (their stub
decoders are deterministic, so exact outputs are assertable even
though the driver gate is rows-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.operators import multimodal

MID_SF = "/root/testdata/sf0.01"


def test_features_pin_known_payload(spark, sf_dir):
    """q_multimodal_features on one known doc: n_bytes equals the UTF-8
    text length and the stub checksum/mean match a host-side
    recomputation byte for byte."""
    docs = (
        multimodal.load(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    doc_id, text = docs[0]["doc_id"], docs[0]["text"]
    payload = text.encode("utf-8")
    want_n = len(payload)
    want_mean = round(sum(payload) / want_n, 4)
    want_ck = sum(payload) % 65_521
    row = (
        multimodal.q_multimodal_features(spark, sf_dir)
        .filter(F.col("doc_id") == doc_id)
        .collect()[0]
    )
    assert (row["n_bytes"], row["mean_byte"], row["checksum"]) == (
        want_n,
        want_mean,
        want_ck,
    )


def test_frame_sampling_shape_and_values(spark, sf_dir):
    """q_multimodal_frames: every asset emits ceil(ceil(n/256)/4)
    frames capped at 8; frame_idx strides by FRAME_EVERY; checksums
    match a host-side recomputation of the same byte slices."""
    feats = {
        r["doc_id"]: r["n_bytes"]
        for r in multimodal.q_multimodal_features(spark, sf_dir).collect()
    }
    frames = multimodal.q_multimodal_frames(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    fs, ev, cap = multimodal.FRAME_SIZE, multimodal.FRAME_EVERY, multimodal.FRAME_MAX
    for doc_id, n_bytes in feats.items():
        n_frames = (n_bytes + fs - 1) // fs
        want = min((n_frames + ev - 1) // ev, cap)
        got = by_doc.get(doc_id, [])
        assert len(got) == want, (doc_id, n_bytes, want, len(got))
        assert sorted(r["frame_idx"] for r in got) == [ev * k for k in range(want)]
    # pin one doc's checksums against host-side byte math
    docs = multimodal.load(spark, sf_dir, "documents").orderBy("doc_id").limit(1).collect()
    doc_id, payload = docs[0]["doc_id"], docs[0]["text"].encode("utf-8")
    for r in sorted(by_doc[doc_id], key=lambda r: r["frame_idx"]):
        frame = payload[r["frame_idx"] * fs : (r["frame_idx"] + 1) * fs]
        assert r["n_bytes"] == len(frame)
        assert r["checksum"] == sum(frame) % 65_521
        assert r["resized_checksum"] == sum(frame[::2]) % 65_521


def test_pluggable_decoder_features_end_to_end(spark, sf_dir):
    """A user-supplied decoder flows through the SAME mapInPandas
    plumbing (schema, batching, partitioning) and its outputs land in
    the result — the production swap-in point for PIL/librosa is real,
    not just documented."""
    from als_hadoop_spark.operators.multimodal import (
        multimodal_features,
        q_multimodal_features,
    )

    def fake_decoder(payload, fmt):
        # a "decode" with a recognizable signature: mean fixed to the
        # payload length mod 7, checksum to the first byte (or -1)
        return float(len(payload) % 7), int(payload[0]) if payload else -1

    rows = multimodal_features(spark, sf_dir, decoder=fake_decoder).collect()
    assert rows
    for r in rows:
        assert r["mean_byte"] == float(r["n_bytes"] % 7)
    # default path unchanged
    stub = q_multimodal_features(spark, sf_dir)
    assert stub.columns == [c.name for c in stub.schema.fields]
    assert stub.count() == len(rows)


def test_pluggable_decoder_frames_end_to_end(spark, sf_dir):
    """A fake frame sampler controls the 1→N expansion: two fixed
    frames per asset with known bytes → known checksums."""
    from als_hadoop_spark.operators.multimodal import multimodal_frames

    def fake_frames(payload, fmt):
        yield 0, b"\x01\x01", b"\x01"
        yield 5, b"\x02\x02\x02", b"\x02"

    df = multimodal_frames(spark, sf_dir, decoder=fake_frames)
    rows = df.collect()
    n_assets = {r["doc_id"] for r in rows}
    assert len(rows) == 2 * len(n_assets)
    for r in rows:
        if r["frame_idx"] == 0:
            assert (r["n_bytes"], r["checksum"], r["resized_checksum"]) == (2, 2, 1)
        else:
            assert (r["n_bytes"], r["checksum"], r["resized_checksum"]) == (3, 6, 2)
