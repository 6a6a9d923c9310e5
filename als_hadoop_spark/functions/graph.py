"""Distributed connected components — the transitive-closure step a
near-dup pipeline needs between "candidate pairs" and "keep one per
cluster".

Near-dup similarity is not transitive (A≈B and B≈C does not imply the
pair (A, C) was ever emitted), so collapsing duplicates by pair alone
under-merges: a chain of borderline near-dups survives as several
"unique" documents. The fix is graph connectivity over the pair edges.

The reference has no graph operators at all (SURVEY.md §2 Part B); this
is a north-star extension. The algorithm is the alternating
large-star / small-star method of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SoCC 2014) — the published shuffle-efficient
formulation:

- **large-star**: every node connects its *larger* neighbors to the
  minimum of its closed neighborhood.
- **small-star**: every node connects its *smaller* neighbors (and
  itself) to the minimum of those.

Each round is two self-contained groupBy+join passes over the edge
list; the edge list monotonically contracts toward a star per
component, converging in O(log² n) rounds on any graph (O(log n) in
practice). Compare a label-propagation loop, which needs O(diameter)
rounds — a 10⁶-long chain of near-identical crawl records would need
10⁶ shuffles there and ~20 here.

Scale posture: no driver-side data beyond a 2-number convergence
signature per round; per-round lineage is cut with
``localCheckpoint(eager=True)`` so the loop's plan never grows
(an iterative DataFrame loop otherwise re-derives every prior round at
each action and overflows the planner); all joins are equi-joins on
node ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Edges as (u=min, v=max), self-loops dropped, deduped."""
    return (
        e.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id in the node's connected
    component. Isolated nodes (absent from edges) are the caller's
    concern — coalesce to the node's own id after a left join.

    Convergence is detected by a per-round (edge-count, edge-hash-sum)
    signature — two bounded scalars, the only driver-side data in the
    loop."""
    e = _canon(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
    ).localCheckpoint(eager=True)

    prev_sig = None
    for _ in range(max_iter):
        # large-star: m(u) = min over N(u) ∪ {u}; emit (v, m(u)) for
        # every strictly-larger neighbor v of u.
        sym = _sym(e)
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = _canon(large)

        # small-star: m(u) = min over smaller neighbors of u; emit
        # (v, m(u)) for each smaller neighbor and (u, m(u)).
        sym = _sym(e)
        small = sym.filter(F.col("v") < F.col("u"))
        mins = small.groupBy("u").agg(F.min("v").alias("m"))
        emitted = small.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
        e = _canon(emitted.union(mins.select("u", F.col("m").alias("v"))))
        e = e.localCheckpoint(eager=True)

        # bit_xor: order-insensitive and overflow-free under ANSI mode
        # (a sum of xxhash64 longs overflows)
        sig = e.agg(
            F.count("*").alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")

    # Converged edge set is a star per component: every edge is
    # (component-min, node). Labels via one symmetric min-aggregate —
    # the center's own min(neighbors) is larger than itself, hence the
    # least() with the node id.
    labels = (
        _sym(e)
        .groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select(
            F.col("u").alias("node"), F.least(F.col("u"), F.col("_mn")).alias("component")
        )
    )
    return labels


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge set; returns
    (node, rank). The caller guarantees no dangling nodes (feed a
    symmetrized edge set — every node then has out-degree ≥ 1), which
    keeps each iteration a pure join-aggregate with no mass-leak
    correction term.

    Scale shape per iteration: ranks ⋈ edges shuffles on the node key
    (ranks is #nodes-sized, edges fact-sized), then one hash aggregate
    on dst — the standard Pregel-as-DataFrame step. The (edge, degree)
    set is materialized ONCE (localCheckpoint) and iterations chain
    LAZILY — a per-round checkpoint barrier measured 1.5× slower at
    sf0.1; lineage is truncated every 4 rounds so arbitrary n_iter
    can't grow an unbounded plan. Nothing data-sized ever reaches the
    driver (the one scalar is the node count)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # materialize the big side pre-partitioned and pre-sorted on the
    # join key, so every round's sort-merge join reuses the layout
    # instead of re-sorting edge-sized data (measured ~20% off the
    # 5-round wall at sf0.1)
    ed = (
        e.join(deg, "src")
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .localCheckpoint(eager=True)
    )
    # derive nodes from the MATERIALIZED (edge, degree) set — deriving
    # from `e` would recompute the upstream edge build (per-table
    # joins/distinct) a second time past the checkpoint
    nodes = ed.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # bounded scalar — the one driver value
    if n_nodes == 0:
        # empty graph → empty (node, rank) frame, not a ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(n_iter):
        contribs = ed.join(ranks, ed.src == F.col("node")).select(
            "dst", (F.col("rank") / F.col("deg")).alias("c")
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(F.sum("c").alias("_s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.lit(damping) * F.col("_s")).alias("rank"),
            )
        )
        if (i + 1) % 4 == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
