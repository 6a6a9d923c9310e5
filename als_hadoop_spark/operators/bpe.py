"""BPE tokenizer training as a distributed iterative operator — the
missing piece between this engine's text-cleaning surface and an
actual LLM training run (every modern tokenizer is byte/char-pair
encoding per Sennrich et al., ACL 2016 — public methodology).

The scale trick that makes BPE trainable over a 100 TB corpus: merge
learning never needs the corpus. One fact pass collapses the corpus to
the (word, freq) VOCABULARY table — bounded by distinct words, not by
tokens — and every merge round thereafter is a join-free
explode/aggregate over that bounded table:

    round k:  word symbol arrays → adjacent pairs (weighted by word
              freq, map-side-combined count) → 1-row argmax (count
              desc, pair asc — a deterministic total order) →
              left-to-right merge applied via a pure-JVM `aggregate`
              HOF fold (no Python, no shuffle)

Rounds chain LAZILY on the vocabulary table with a localCheckpoint
every CHECKPOINT_EVERY rounds (same lineage policy as
``functions.graph.pagerank``); the only driver-side state is the
1-row argmax per round — BPE is inherently sequential in its merge
list (merge k+1's pair counts depend on merge k), so one bounded
collect per round is the known lower bound, not a shortcut.

The fold is the textbook left-to-right scan: append each symbol, and
when the accumulator ends in `left` and the incoming symbol is
`right`, replace the tail with the merged symbol — so "aaa" under
merge (a,a) becomes ["aa","a"], exactly like the reference
implementation in the test.

Rows-only by design: 8 rounds of argmax-then-retokenize are not
expressible as one ANSI-SQL statement a DuckDB oracle could run
(unlike PageRank's pure-arithmetic rounds, each BPE round embeds a
data-dependent LITERAL — the learned pair — into the next round's
plan). The correctness burden sits in `tests/test_bpe.py`: exact
equality of the full (rank, left, right, merged, pair_count) table
against an independent pure-Python BPE trainer on the same corpus,
plus an overlapping-run semantics pin.

The reference engine has no text surface at all (SURVEY §2 Part B);
this is a north-star LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

#: number of merge rounds to learn (each = one bounded-table pass)
BPE_MERGES = 8
#: word-end marker appended to every word's symbol sequence (Sennrich
#: et al.'s </w>) so merges can distinguish suffixes from infixes
BPE_EOW = "</w>"
#: truncate the vocabulary table's lineage every N rounds
CHECKPOINT_EVERY = 4


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE corpus pass: lowercase whitespace words → (word, freq).
    Everything after this runs on the vocabulary-bounded result."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(left: str, right: str, merged: str) -> F.Column:
    """Left-to-right application of one merge to the `syms` array —
    a pure-JVM `aggregate` fold (no Python, no shuffle)."""
    return F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(vocab: DataFrame, n_merges: int = BPE_MERGES) -> list[tuple]:
    """Run `n_merges` BPE rounds over a (word, freq) table; returns
    [(rank, left, right, merged, pair_count), ...]. Ties on count
    break on (left, right) lexicographically — a total order, so the
    merge list is deterministic in any engine."""
    merges, _ = learn_bpe_with_vocab(vocab, n_merges)
    return merges


def learn_bpe_with_vocab(
    vocab: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[list[tuple], DataFrame]:
    """`learn_bpe` plus the FINAL (freq, syms) vocabulary table with
    every learned merge already applied — so a tokenize step can reuse
    it instead of re-chaining the folds from scratch."""
    vocab = vocab.select(
        "freq",
        F.concat(
            F.split("word", ""), F.array(F.lit(BPE_EOW))
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(
                F.col("p.l").alias("left"), F.col("p.r").alias("right")
            )
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
        )
        top = pairs.collect()  # 1 bounded row — BPE's sequential core
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merged = left + right
        merges.append((rank, left, right, merged, int(cnt)))
        vocab = vocab.select(
            "freq", _merge_fold(left, right, merged).alias("syms")
        )
        if (rank + 1) % CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table over the documents corpus: one
    corpus pass to the vocabulary, then BPE_MERGES bounded rounds
    (see module docstring for the scale argument)."""
    merges = learn_bpe(_word_freqs(spark, sf_dir))
    return spark.createDataFrame(
        merges,
        "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT",
    )


#: top-N BPE tokens reported by q_bpe_tokenize
BPE_TOPK = 20


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table to the corpus: the weighted
    BPE-token frequency table (top-BPE_TOPK), i.e. what the trained
    tokenizer actually emits over the training corpus.

    Scale shape: tokenization is a property of the WORD, so the merges
    fold over the vocabulary-bounded (word, freq) table — BPE_MERGES
    chained pure-JVM `aggregate` folds in one lazy plan — and the
    final counts are one explode + weighted aggregate on that bounded
    table. The corpus itself is touched exactly once (the word-freq
    pass inside learn_bpe); applying the tokenizer adds ZERO further
    corpus passes. Rows-only for the same reason as q_bpe_merges (the
    plan embeds learned literals); `tests/test_bpe.py` pins the FULL
    token-frequency dict against the reference implementation."""
    _merges, toks = learn_bpe_with_vocab(_word_freqs(spark, sf_dir))
    return (
        toks.select("freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(BPE_TOPK)
    )


QUERIES = {"q_bpe_merges": q_bpe_merges, "q_bpe_tokenize": q_bpe_tokenize}

#: rows-only by design: iterative argmax-dependent rounds are not one
#: SQL statement; exact-equality gate vs a pure-Python BPE trainer in
#: tests/test_bpe.py.
ORACLES: dict[str, str] = {}
