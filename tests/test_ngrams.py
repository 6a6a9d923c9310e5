"""N-gram operator gates: exact window semantics on tiny planted
inputs, plus invariants of the registered queries on the fixtures.
The full value-level check is the DuckDB oracle (check_oracle.py /
driver CORRECTNESS); these pin the semantics the oracle can't express
— planted contamination, flag logic, short-doc edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.operators import ngrams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_lead_ngrams_full_windows_only(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "x y")])
    got = {
        (r["doc_id"], r["ngram"])
        for r in ngrams.lead_ngrams(docs, 3).collect()
    }
    # doc 2 is shorter than n → contributes nothing (no partial grams)
    assert got == {(1, "a b c"), (1, "b c d")}


def test_contamination_planted_pair(spark):
    shared = "t1 t2 t3 t4 t5 t6 t7 t8"  # exactly one 8-gram
    docs = _docs(
        spark,
        [
            (20, f"{shared} probe tail words here"),   # probe: 20 % 20 == 0
            (3, f"prefix {shared} other corpus text"),  # corpus, contaminated
            (7, "completely different body with no overlap at all ok"),
        ],
    )
    rows = ngrams.contamination_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["corpus_doc_id"], r["probe_doc_id"]) == (3, 20)
    assert r["n_shared"] == 1
    # doc 3 has 12 tokens → 5 distinct 8-grams, 1 shared
    assert abs(r["contamination_rate"] - 1 / 5) < 1e-6


def test_doc_repetition_flags_and_argmax(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),  # one bigram repeated
            # clean doc: 12 distinct tokens → top bigram 1/11 < 0.1
            (2, "one two three four five six seven eight nine ten eleven twelve"),
        ],
    )
    by_id = {r["doc_id"]: r for r in ngrams.doc_repetition(docs).collect()}
    assert by_id[1]["top_bigram"] == "spam spam"
    assert by_id[1]["top_bigram_frac"] == 1.0
    assert by_id[1]["distinct_ratio"] < 0.3
    assert by_id[1]["flagged"] is True
    assert by_id[2]["top_bigram_frac"] < 0.1
    assert by_id[2]["distinct_ratio"] == 1.0
    assert by_id[2]["flagged"] is False


def test_ngram_lm_topk_shape(spark, sf_dir):
    rows = ngrams.q_ngram_lm(spark, sf_dir).collect()
    assert len(rows) == ngrams.LM_TOP_K
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # rel_freq is a proper relative frequency, monotone with the count
    # (exact values are pinned by the DuckDB oracle, not re-derived
    # here — the 6-decimal rounding makes 1/rel_freq lossy)
    assert all(0 < r["rel_freq"] <= 1 for r in rows)


def test_token_entropy_uniform_and_degenerate(spark):
    docs = spark.createDataFrame(
        [(1, "en", "a b c d"), (2, "en", "x x x")],
        "doc_id LONG, lang STRING, text STRING",
    )
    import math

    by_id = {r["doc_id"]: r for r in ngrams.token_entropy(docs).collect()}
    # uniform over 4 distinct tokens → H = ln 4, normalized exactly 1
    assert abs(by_id[1]["entropy"] - math.log(4)) < 1e-6
    assert abs(by_id[1]["norm_entropy"] - 1.0) < 1e-6
    # single distinct token → zero entropy, normalization undefined
    assert by_id[2]["entropy"] == 0.0
    assert by_id[2]["norm_entropy"] is None


def test_pmi_planted_collocation(spark):
    # "zz qq" always adjacent and both tokens appear ONLY in that pair
    # → the strongest collocation in the corpus; filler tokens vary.
    rows = [
        (i, "zz qq " + " ".join(f"w{j % 7}" for j in range(i, i + 10)))
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = ngrams.pmi_bigrams(docs).collect()
    assert got, "no bigram cleared the min-count floor"
    top = got[0]
    assert (top["tok_a"], top["tok_b"]) == ("zz", "qq")
    assert top["n_pair"] == 6
    # PMI of a pair whose members never appear apart is ln(N_uni²/(c²·N_bg))
    import math

    n_uni = sum(len(r[1].split()) for r in rows)
    n_bg = n_uni - len(rows)
    expect = math.log((6 / n_bg) / ((6 / n_uni) * (6 / n_uni)))
    assert abs(top["pmi"] - expect) < 1e-5
