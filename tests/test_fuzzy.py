"""Gates for the PassJoin-style edit-distance join — value parity is
covered by the brute-force DuckDB oracle; these tests pin (a) the
pigeonhole blocking across a LENGTH-CHANGING edit (deletion), which
the fixture data (uniform-length names, substitution-only probes)
never forces, and (b) the no-quadratic plan shape."""

from __future__ import annotations

from als_hadoop_spark.operators.fuzzy import q_fuzzy_join
from als_hadoop_spark.plans import assert_no_quadratic_join, count_shuffles


def _cust(spark, rows):
    return spark.createDataFrame(
        [(k, n, 0, 0.0, "s") for k, n in rows],
        "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE, c_mktsegment STRING",
    )


def test_finds_match_across_deletion(spark, tmp_path):
    """Probe (from cust 7) = 'Customer#00000X789'; cust 3's name is
    that with one char DELETED (ed = 1, length 17 vs 18) — the blocking
    must surface it through the shifted-segment keys, and the integer
    argmin must prefer it over the source (same distance, lower key)."""
    rows = [
        (3, "Customer#00000X89"),    # ed 1 via deletion of '7'
        (7, "Customer#00000a789"),   # probe source (ed 1 via the mutation)
        (42, "Customer#999999999"),  # far away, never a match
    ]
    _cust(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = q_fuzzy_join(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["probe_key"], r["probe_name"]) == (7, "Customer#00000X789")
    assert (r["match_custkey"], r["distance"]) == (3, 1)


def test_exact_match_wins(spark, tmp_path):
    """A corpus string identical to the probe (distance 0) beats every
    distance-1 candidate regardless of key order."""
    rows = [
        (7, "Customer#00000a789"),
        (900, "Customer#00000X789"),  # equals the probe exactly
    ]
    _cust(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = q_fuzzy_join(spark, str(tmp_path)).collect()
    assert [(r["match_custkey"], r["distance"]) for r in got] == [(900, 0)]


def test_no_quadratic_node_and_bounded_shuffles(spark, sf_dir):
    """The whole join is equi-join blocking + verification: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    df = q_fuzzy_join(spark, sf_dir)
    assert_no_quadratic_join(df)
    assert count_shuffles(df) <= 6


def test_blocking_is_exact_on_adversarial_random_strings(spark):
    """PassJoin completeness property: over random short strings from a
    2-letter alphabet (maximal segment collisions AND rich edit
    variety — insertions, deletions, substitutions all arise between
    random pairs), the blocked+verified pair set must equal the
    brute-force levenshtein join. One Spark run over a seeded 120×60
    corpus/probe cross — ~7200 ground-truth pairs."""
    import random

    from als_hadoop_spark.operators.fuzzy import FUZZY_TAU, match_pairs

    rng = random.Random(1234)
    corpus = [
        (k, "".join(rng.choice("ab") for _ in range(rng.randint(4, 12))))
        for k in range(1, 121)
    ]
    probes = [
        (k, "".join(rng.choice("ab") for _ in range(rng.randint(4, 12))))
        for k in range(1, 61)
    ]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (pk, ck)
        for pk, pn in probes
        for ck, cn in corpus
        if lev(pn, cn) <= FUZZY_TAU
    }
    assert len(want) > 100  # the test actually exercises something

    cust = spark.createDataFrame(corpus, "c_custkey LONG, c_name STRING")
    pr = spark.createDataFrame(probes, "probe_key LONG, probe_name STRING")
    got = {
        (r["probe_key"], r["c_custkey"])
        for r in match_pairs(cust, pr, FUZZY_TAU).collect()
    }
    assert got == want
