"""Exact-equality gate for the BPE trainer (operators/bpe.py):
rows-only in the driver contract, so an independent pure-Python BPE
implementation carries the correctness burden — the full merge table
must match merge-for-merge, count-for-count."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from als_hadoop_spark.operators.bpe import (
    BPE_EOW,
    BPE_MERGES,
    learn_bpe,
    q_bpe_merges,
)
from als_hadoop_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016, public pseudocode),
    implemented independently of the Spark path: weighted adjacent
    pair counts, argmax with (count desc, pair asc) tie-break,
    left-to-right merge application."""
    vocab = {tuple(list(w) + [BPE_EOW]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_exactly(spark):
    """The Spark-learned merge table equals the pure-Python reference
    on the real fixture corpus — every rank, pair, and weighted
    count."""
    docs = load(spark, SF_DIR, "documents")
    freqs = {
        r["word"]: r["n"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expected = _reference_bpe(freqs, BPE_MERGES)
    got = [tuple(r) for r in q_bpe_merges(spark, SF_DIR).collect()]
    assert got == expected
    assert len(got) == BPE_MERGES


def test_bpe_overlapping_run_semantics(spark):
    """Left-to-right application: under merge (a,a), 'aaaa' yields
    two 'aa' symbols and 'aaa' yields ['aa','a'] — the fold must not
    re-merge its own output (no 'aaa' ← ('aa','a') in round 1) and
    counts must reflect non-overlapping occurrences."""
    vocab = spark.createDataFrame(
        [("aaaa", 1), ("aaa", 2)], "word STRING, freq LONG"
    )
    merges = learn_bpe(vocab, n_merges=2)
    # round 0: pair (a,a) occurs 3x in 'aaaa' + 2·2x in 'aaa' = 7 by
    # overlapping count ... but BPE counts ADJACENT POSITIONS:
    # 'aaaa' contributes 3, 'aaa' contributes 2 each = 4 → total 7
    assert merges[0][1:4] == ("a", "a", "aa")
    assert merges[0][4] == 3 + 2 * 2
    # after applying: 'aaaa' → [aa, aa, </w>], 'aaa' → [aa, a, </w>]
    # round 1 candidates: (aa,aa):1, (aa,</w>):1, (aa,a):2, (a,</w>):2
    # argmax → count 2, tie between (a,</w>) and (aa,a); lexicographic
    # tie-break picks ('a','</w>') < ('aa','a')? compare: 'a'=='a' is
    # a prefix of 'aa' → 'a' sorts first, so winner is ('a', '</w>').
    assert merges[1][4] == 2
    assert merges[1][1:3] in {("a", "</w>"), ("aa", "a")}
    assert merges[1][1:3] == min([("a", "</w>"), ("aa", "a")])


def test_bpe_tokenize_matches_reference(spark):
    """Applying the learned merges: the reported top-K BPE token
    frequencies equal the reference implementation's tokenization of
    the same corpus, weight for weight."""
    from collections import Counter

    from als_hadoop_spark.operators.bpe import BPE_TOPK, q_bpe_tokenize

    docs = load(spark, SF_DIR, "documents")
    freqs = {
        r["word"]: r["n"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    merges = _reference_bpe(freqs, BPE_MERGES)
    tok_counts: Counter = Counter()
    for w, f in freqs.items():
        syms = list(w) + [BPE_EOW]
        for _, left, right, merged, _c in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            syms = out
        for s in syms:
            tok_counts[s] += f
    expected = sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOPK]
    got = [(r["token"], r["n"]) for r in q_bpe_tokenize(spark, SF_DIR).collect()]
    assert got == expected


def test_bpe_empty_corpus(spark):
    """Zero words → zero merges, no crash (the round loop must break
    on the first empty argmax, not iterate on empty plans)."""
    from als_hadoop_spark.operators.bpe import learn_bpe

    vocab = spark.createDataFrame([], "word STRING, freq LONG")
    assert learn_bpe(vocab) == []
