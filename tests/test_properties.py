"""Property-based tests (SURVEY.md §5.4): hypothesis-generated small
frames against brute-force Python references. Example counts are kept
low — each example pays a Spark job — but the generators cover the
edges unit fixtures miss (duplicate keys, ties, empty sides)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(keys=st.lists(st.integers(-(10**6), 10**6), min_size=1, max_size=40))
def test_dense_ids_is_sorted_bijection(spark, keys):
    """dense_ids == rank in sorted distinct order, for ANY key multiset
    (duplicates collapse, negatives sort before positives)."""
    from als_hadoop_spark.functions.ids import dense_ids

    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    got = {r["k"]: r["dense_id"] for r in dense_ids(df, "k", num_partitions=3).collect()}
    want = {k: i for i, k in enumerate(sorted(set(keys)))}
    assert got == want


@settings(**SETTINGS)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=25
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=25
    ),
)
def test_as_of_join_matches_bruteforce(spark, lefts, rights):
    """as_of_join == per-row 'latest right strictly before me on my
    key' brute force, including ties (same-ts right must NOT match)
    and keys with no right rows at all."""
    from als_hadoop_spark.operators.timeseries import as_of_join

    rights = list({(k, t): (k, t) for k, t in rights}.values())  # unique (key, ts)
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "row_id LONG, k LONG, t LONG"
    )
    right = spark.createDataFrame(
        [(k, t, float(k * 100 + t)) for k, t in rights] or [(99, 99, 0.0)],
        "k LONG, rt LONG, val DOUBLE",
    )
    if not rights:
        right = right.filter("k < 0")  # truly empty right side
    out = {
        r["row_id"]: (r["asof_ts"], r["asof_val"])
        for r in as_of_join(
            left, right, on="k", left_ts="t", right_ts="rt", value_cols=["val"]
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        prior = [(rt, v) for (rk, rt, v) in ((a, b, float(a * 100 + b)) for a, b in rights) if rk == k and rt < t]
        want = max(prior) if prior else (None, None)
        assert out[i] == want, f"row {i} (k={k}, t={t}): {out[i]} != {want}"


@settings(**SETTINGS)
@given(
    ids=st.lists(st.integers(0, 10**14), unique=True, min_size=1, max_size=30),
)
def test_mixture_sampling_is_layout_independent(spark, ids):
    """The mixture-sampling predicate must select the IDENTICAL doc set
    under any partition layout (its whole point vs F.rand/sample), and
    must agree with a host-side recomputation of the same arithmetic —
    including ids far beyond 2^31 (the overflow-guard range)."""
    from als_hadoop_spark.operators.text import _KNUTH, _MOD31, MIXTURE_RATES

    langs = ["en", "zh", "fr"]
    rows = [(i, langs[k % 3], 1, "x") for k, i in enumerate(ids)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, n_chars LONG, text STRING"
    )

    from pyspark.sql import functions as F

    def kept_set(df):
        u = F.pmod(F.pmod(F.col("doc_id"), F.lit(_MOD31)) * F.lit(_KNUTH), F.lit(_MOD31)) / F.lit(
            float(_MOD31)
        )
        rate = F.lit(1.0)
        for lang, r in MIXTURE_RATES.items():
            rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
        return {r["doc_id"] for r in df.filter(u < rate).select("doc_id").collect()}

    got1 = kept_set(docs.repartition(1))
    got7 = kept_set(docs.repartition(7, "lang"))
    want = {
        i
        for k, i in enumerate(ids)
        if ((i % _MOD31) * _KNUTH) % _MOD31 / _MOD31
        < MIXTURE_RATES.get(langs[k % 3], 1.0)
    }
    assert got1 == got7 == want


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.floats(0, 10**6, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_quantiles_match_numpy(spark, vals):
    """grouped_quantiles (the no-full-sort chunk-locate algorithm)
    equals numpy linear interpolation for every quantile level on any
    value multiset — single-element groups, ties, integral positions."""
    import numpy as np

    from als_hadoop_spark.functions.quantiles import grouped_quantiles

    qs = (("p25", 0.25), ("p50", 0.5), ("p90", 0.9), ("p100", 1.0))
    df = spark.createDataFrame(vals, "g STRING, v DOUBLE").repartition(5)
    out = grouped_quantiles(df, ["g"], "v", qs, num_partitions=3).collect()
    got = {(r["g"], r["q_name"]): (r["value"], r["n"]) for r in out}
    for g in {g for g, _ in vals}:
        data = [v for gg, v in vals if gg == g]
        for name, q in qs:
            want = float(np.percentile(data, q * 100))
            val, n = got[(g, name)]
            assert n == len(data)
            assert abs(val - want) < 1e-6, (g, name, val, want)


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.floats(0, 10**6, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_rank_percentiles_match_numpy(spark, vals):
    """The distributed rank-based exact percentile (grouped_ranks +
    interpolation) equals numpy's linear interpolation for any value
    multiset — including single-element groups (frac paths) and ties."""
    import numpy as np

    from als_hadoop_spark.functions.ids import grouped_ranks
    from pyspark.sql import functions as F

    df = spark.createDataFrame(vals, "g STRING, v DOUBLE").repartition(5)
    ranked = grouped_ranks(df, ["g"], "v", num_partitions=3)
    counts = df.groupBy("g").agg(F.count("*").alias("n"))
    j = ranked.join(F.broadcast(counts), "g")
    q = 0.9
    pos = (F.col("n") - 1) * F.lit(q)
    lo, frac = F.floor(pos) + 1, pos - F.floor(pos)
    got = {
        r["g"]: r["p"]
        for r in (
            j.filter((F.col("rank") == lo) | (F.col("rank") == lo + 1))
            .groupBy("g")
            .agg(
                F.max(F.when(F.col("rank") == lo, F.col("v"))).alias("vlo"),
                F.max(F.when(F.col("rank") == lo + 1, F.col("v"))).alias("vhi"),
                F.first(frac).alias("f"),
            )
            .select(
                "g",
                F.when(F.col("f") == 0, F.col("vlo"))
                .otherwise(F.col("vlo") + F.col("f") * (F.col("vhi") - F.col("vlo")))
                .alias("p"),
            )
            .collect()
        )
    }
    for g in {g for g, _ in vals}:
        want = float(np.percentile([v for gg, v in vals if gg == g], 90))
        assert abs(got[g] - want) < 1e-6, (g, got[g], want)


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=25
    )
)
def test_connected_components_match_union_find(spark, edges):
    """large-star/small-star CC must equal a brute-force union-find on
    ANY small graph — self-loops, duplicate edges, chains, cliques."""
    from als_hadoop_spark.functions.graph import connected_components

    real = [(u, v) for u, v in edges if u != v]
    if not real:
        return
    df = spark.createDataFrame(real, "src LONG, dst LONG")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in real:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(**SETTINGS)
@given(
    ts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2000)), min_size=1, max_size=30
    )
)
def test_interval_merge_islands_match_bruteforce(spark, ts):
    """The running-max-end island windows must reproduce a brute-force
    interval sweep for ANY event multiset (ties, duplicates, nested and
    touching intervals). Span fixed at 100 time units."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    span = 100
    df = spark.createDataFrame(ts, "user_id LONG, t LONG").select(
        "user_id", F.col("t").alias("start"), (F.col("t") + span).alias("end")
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("end").over(w_prev)
    is_new = F.when(prev_end.isNull() | (F.col("start") > prev_end), 1).otherwise(0)
    got = sorted(
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in df.select(
            "user_id", "start", "end", F.sum(is_new).over(w_run).alias("isl")
        )
        .groupBy("user_id", "isl")
        .agg(F.min("start").alias("s"), F.max("end").alias("e"), F.count("*").alias("n"))
        .collect()
    )

    want = []
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t in ts:
        by_user[u].append((t, t + span))
    for u, ivs in by_user.items():
        ivs.sort()
        cur_s, cur_e, cnt = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                want.append((u, cur_s, cur_e, cnt))
                cur_s, cur_e, cnt = s, e, 1
            else:
                cur_e = max(cur_e, e)
                cnt += 1
        want.append((u, cur_s, cur_e, cnt))
    assert got == sorted(want)


@settings(**SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
        min_size=1,
        max_size=40,
    )
)
def test_zvalue_matches_reference_interleave(spark, pairs):
    """The JVM Morton key equals the textbook bit interleave for any
    16-bit inputs — and is therefore a bijection on (x, y)."""
    from pyspark.sql import functions as F

    from als_hadoop_spark.sources.tables import zvalue

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "x LONG, y LONG")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y)
    assert len(set(got.values())) == len(set(pairs))  # bijective


@settings(**SETTINGS)
@given(
    toks=st.lists(
        st.tuples(st.text("abcde", min_size=1, max_size=3), st.integers(1, 99)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_global_ranks_matches_row_number(spark, toks):
    """global_ranks == row_number() OVER (ORDER BY freq DESC, tok) for
    any (tok, freq) table — including freq ties broken by the string
    column and descending order — while never sorting in one task."""
    from als_hadoop_spark.functions.ids import global_ranks
    from pyspark.sql import functions as F

    df = spark.createDataFrame(toks, "tok STRING, freq LONG").repartition(5)
    got = {
        r["tok"]: r["rank"]
        for r in global_ranks(
            df, [F.col("freq").desc(), F.col("tok")], num_partitions=3
        ).collect()
    }
    want = {
        tok: i + 1
        for i, (tok, _) in enumerate(sorted(toks, key=lambda t: (-t[1], t[0])))
    }
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),          # low-card group
            st.integers(0, 50),                         # order key
            st.one_of(st.none(), st.integers(0, 9)),    # lead value (nullable!)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_distributed_lead_matches_window_lead(spark, rows):
    """distributed_lead == F.lead over partitionBy(group) for any
    frame — including NULL lead values (which must NOT be confused
    with 'no next row'), groups spanning partition boundaries, and
    single-row groups."""
    from als_hadoop_spark.functions.ids import distributed_lead
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # make the order a total order per group (dedupe ties)
    uniq = {}
    for g, t, v in rows:
        uniq[(g, t)] = v
    data = [(g, t, v) for (g, t), v in uniq.items()]
    df = spark.createDataFrame(data, "g STRING, t LONG, v LONG").repartition(7)

    got = {
        (r["g"], r["t"]): r["v_next"]
        for r in distributed_lead(
            df, "g", ["t"], ["v"], num_partitions=3
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("t")
    want = {
        (r["g"], r["t"]): r["v_next"]
        for r in df.withColumn("v_next", F.lead("v").over(w)).collect()
    }
    assert got == want
