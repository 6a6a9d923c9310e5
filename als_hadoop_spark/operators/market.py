"""The remaining TPC-H shapes expressible over the fixture's columns
(Q6 forecast-revenue, Q7 volume-shipping, Q8 market-share, Q10
returned-items, Q14 promo-share).

With these five, the repo covers EVERY TPC-H query whose required
columns exist in the driver's star schema: Q1/Q3/Q5 (relational.py /
analytics.py), Q13/Q15/Q18/Q21/Q22 (tpch.py), Q17 (q_correlated_
subquery), and Q6/Q7/Q8/Q10/Q14 here. The eight remaining queries all
need columns the fixtures deliberately omit (partsupp for Q2/Q9/Q11/
Q16/Q20; l_commitdate/l_receiptdate for Q4/Q12; l_shipmode/
l_shipinstruct/p_container for Q12/Q19).

Why these five earn a row each (distinct planner capability):

- Q6  pure scan-filter-aggregate with a BETWEEN on a measure — the
  no-join baseline every column-pruning/pushdown claim is judged on
- Q7  double-sided dimension filter (supplier nation AND customer
  nation) meeting in the fact table — two big shuffles is optimal,
  everything dimensional rides broadcasts
- Q8  conditional market share: one group-by computing a ratio of a
  CASE-filtered sum over the total sum — numerator and denominator in
  one pass, never two fact scans
- Q10 filter + join + aggregate + TakeOrdered top-N on revenue — the
  canonical "who are my worst customers" operational query
- Q14 two-branch conditional aggregate over a broadcast part join —
  a 1-row ratio with zero shuffles beyond the broadcast probe

Float discipline follows ``tpch.py``: all money math in exact integer
cents (BIGINT), divided back for display only; the Q6 discount BETWEEN
is evaluated on rounded integer cents in BOTH engines so no IEEE
boundary can flip a row.

The reference engine has none of this surface (its only "query" is the
hand-assembled ALS job chain, ``ALS-Hadoop/ALS/ALS.java:217-331``);
these are Part-B gap fillers per SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .tpch import _cents

#: Q6 — one-year window, mid-range discounts, small quantities
Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_DISC_LO_CENTS = 5
Q6_DISC_HI_CENTS = 7
Q6_MAX_QTY = 24.0

#: Q7 — supplier-side and customer-side regions (regions, not the
#: classic single nations, so the sf0.001 fixture's 10 suppliers
#: still populate both sides)
Q7_SUPP_REGION = "EUROPE"
Q7_CUST_REGION = "ASIA"
Q7_DATE_LO = "1996-01-01"
Q7_DATE_HI = "1998-01-01"

#: Q8 — market region, the nation whose share we track, part type
Q8_REGION = "EUROPE"
Q8_NATION = "NATION_8"
Q8_TYPE = "PROMO"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"

#: Q10 — one quarter of returned items
Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1996-04-01"
Q10_TOPN = 20

#: Q14 — one month
Q14_DATE_LO = "1996-09-01"
Q14_DATE_HI = "1996-10-01"


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from hypothetically eliminating
    mid-range discounts — SUM(price·discount) under three pushable
    predicates, no join.

    Plan shape: single fact scan with a 4-col ReadSchema; the
    l_shipdate and l_quantity predicates push to the parquet reader
    (PushedFilters), while the discount BETWEEN intentionally
    evaluates post-scan — it compares round(l_discount·100) to
    integer bounds in both engines so the 0.05/0.07 boundaries are
    exact cross-engine, and a derived expression can't push. One
    partial+final aggregate of ONE bigint — the yardstick query for
    scan efficiency at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    disc_cents = F.round(F.col("l_discount") * 100).cast("bigint")
    price_cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts(Q6_DATE_LO))
            & (F.col("l_shipdate") < _ts(Q6_DATE_HI))
            & (F.col("l_quantity") < Q6_MAX_QTY)
        )
        .filter(disc_cents.between(Q6_DISC_LO_CENTS, Q6_DISC_HI_CENTS))
        .agg(
            F.round(F.sum(price_cents * disc_cents) / 10000.0, 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two trade regions —
    revenue per (supplier nation, customer nation, ship year) where
    the supplier sits in Q7_SUPP_REGION and the customer in
    Q7_CUST_REGION.

    Plan shape: both dimension chains (region→nation→supplier,
    region→nation→customer) collapse to broadcasts — suppliers are a
    small dimension outright, and the customer side broadcasts its
    (c_custkey → n_name) map only AFTER the region filter prunes it
    to 1/5 (at true scale, customer does not broadcast: Catalyst
    falls back to a shuffle join on o_custkey and the plan is still
    two big exchanges — lineitem⋈orders and orders⋈customer — which
    is the known optimum for Q7). The customer broadcast lands on
    orders BEFORE the fact join, so the region filter (1/5) prunes
    the order side ahead of the one fact shuffle (join on
    l_orderkey); the final aggregate is bounded by
    |nations|²·|years|."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    def nations_in(region_name: str):
        return (
            nation.join(
                region,
                (nation.n_regionkey == region.r_regionkey)
                & (region.r_name == region_name),
            )
            .select("n_nationkey", "n_name")
        )

    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            nations_in(Q7_SUPP_REGION),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            nations_in(Q7_CUST_REGION),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q7_DATE_LO))
        & (F.col("l_shipdate") < _ts(Q7_DATE_HI))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    qualified = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(qualified, li.l_orderkey == qualified.o_orderkey)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(_cents("l_extendedprice", "l_discount")) / 10000.0, 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: Q8_NATION's share of Q8_REGION's market for
    Q8_TYPE parts, per order year.

    Plan shape: numerator and denominator come out of ONE fact pass —
    a conditional sum (CASE WHEN supp_nation = target) next to the
    total sum in the same bounded-key aggregate; the naive two-scan
    formulation doubles the dominant cost. Part (type-filtered, 1/6)
    and supplier→nation ride broadcasts into lineitem before its one
    shuffle to orders; the customer side is region-pruned then joined.
    Share arithmetic: exact bigint cents on both sides of the divide,
    rounded at 6dp in both engines."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    mkt_nations = (
        nation.join(
            region,
            (nation.n_regionkey == region.r_regionkey)
            & (region.r_name == Q8_REGION),
        )
        .select("n_nationkey")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(mkt_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q8_DATE_LO))
        & (F.col("o_orderdate") < _ts(Q8_DATE_HI))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = _cents("l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(
                        F.lit(0).cast("bigint")
                    )
                )
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-N customers by revenue lost to returned
    items in one quarter.

    Plan shape: both fact-side filters (returnflag on lineitem, the
    order-date quarter on orders) are pushed into their scans BEFORE
    the l_orderkey shuffle join; the per-customer aggregate is the
    second (bounded, map-side-combined) shuffle; customer attaches via
    an equi-join on the aggregated (customer-sized) stream and nation
    via broadcast; the final top-N compiles to
    TakeOrderedAndProject — no global sort materializes."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q10_DATE_LO))
        & (F.col("o_orderdate") < _ts(Q10_DATE_HI))
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(_cents("l_extendedprice", "l_discount")).alias("_rev_cents")
        )
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            # exact bigint → double conversion + division are identical
            # IEEE ops in both engines; a ROUND(…, 2) here would sit on
            # a half-cent knife edge (….595 rounds differently), so the
            # raw quotient is the cross-engine-stable form
            (F.col("_rev_cents") / 10000.0).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(Q10_TOPN)
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO-type
    parts — a 1-row two-branch conditional aggregate.

    Plan shape: date filter pushes into the fact scan (one month ≈
    1/80 of rows); part, projected to (p_partkey, is_promo), rides a
    broadcast; numerator and denominator come from the same single
    aggregate — zero exchanges besides the broadcast. The ratio
    divides two exact bigint cents values (both < 2⁵³, so the
    double division is identical IEEE in both engines), rounded 6dp."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q14_DATE_LO))
        & (F.col("l_shipdate") < _ts(Q14_DATE_HI))
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == Q8_TYPE).alias("_is_promo")
    )
    rev = _cents("l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("_is_promo"), rev).otherwise(F.lit(0).cast("bigint")))
                / F.sum(rev),
                6,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES = {
    "q_forecast_revenue": q_forecast_revenue,
    "q_volume_shipping": q_volume_shipping,
    "q_market_share": q_market_share,
    "q_returned_items": q_returned_items,
    "q_promo_revenue": q_promo_revenue,
}

_CENTS_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)

ORACLES = {
    "q_forecast_revenue": f"""
        SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_discount * 100) AS BIGINT))
                     / 10000.0, 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q6_DATE_HI} 00:00:00'
          AND l_quantity < {Q6_MAX_QTY}
          AND CAST(ROUND(l_discount * 100) AS BIGINT)
              BETWEEN {Q6_DISC_LO_CENTS} AND {Q6_DISC_HI_CENTS}
    """,
    "q_volume_shipping": f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               ROUND(SUM({_CENTS_SQL}) / 10000.0, 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN region sr ON sn.n_regionkey = sr.r_regionkey
                      AND sr.r_name = '{Q7_SUPP_REGION}'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region cr ON cn.n_regionkey = cr.r_regionkey
                      AND cr.r_name = '{Q7_CUST_REGION}'
        WHERE l_shipdate >= TIMESTAMP '{Q7_DATE_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q7_DATE_HI} 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q_market_share": f"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               ROUND(SUM(CASE WHEN sn.n_name = '{Q8_NATION}'
                              THEN {_CENTS_SQL} ELSE 0 END)
                     / CAST(SUM({_CENTS_SQL}) AS DOUBLE), 6) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '{Q8_DATE_LO} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{Q8_DATE_HI} 00:00:00'
          AND EXISTS (
              SELECT 1 FROM customer
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region cr ON cn.n_regionkey = cr.r_regionkey
              WHERE c_custkey = o_custkey AND cr.r_name = '{Q8_REGION}')
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q_returned_items": f"""
        SELECT c_custkey, c_name,
               rev_cents / 10000.0 AS revenue,
               ROUND(c_acctbal, 2) AS c_acctbal,
               n_name
        FROM (
            SELECT o_custkey, SUM({_CENTS_SQL}) AS rev_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '{Q10_DATE_LO} 00:00:00'
              AND o_orderdate <  TIMESTAMP '{Q10_DATE_HI} 00:00:00'
            GROUP BY o_custkey
        )
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
        LIMIT {Q10_TOPN}
    """,
    "q_promo_revenue": f"""
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = '{Q8_TYPE}'
                                      THEN {_CENTS_SQL} ELSE 0 END)
                     / CAST(SUM({_CENTS_SQL}) AS DOUBLE), 6) AS promo_share,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '{Q14_DATE_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q14_DATE_HI} 00:00:00'
    """,
}
