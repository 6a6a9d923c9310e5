"""Plan-inspection helpers: cheap guards that the physical plan Spark
actually picked is the plan the operator was designed for.

The engine's 100 TB posture lives or dies on plan shape — a filter that
silently stops reaching the parquet scan, a broadcast that degrades to
a shuffle, or a bucketized join that replans as a nested loop is a
correctness-of-design regression even when results stay right. These
asserts make those regressions fail tests instead of benchmarks.

Used by ``tests/test_plans.py``; exposed as library API for users
hardening their own pipelines.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The df.explain(mode) output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan shows a non-empty PushedFilters list containing
    every given fragment (e.g. ``"GreaterThanOrEqual(l_quantity"``)."""
    plan = explain_str(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    pushed = [
        line for line in plan.splitlines() if "PushedFilters:" in line and "[]" not in line
    ]
    assert pushed, f"PushedFilters empty:\n{plan}"
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; got: {joined}"


def assert_broadcast_join(df: DataFrame, n_min: int = 1) -> None:
    """Assert at least ``n_min`` broadcast hash joins in the plan."""
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= n_min, f"expected >= {n_min} BroadcastHashJoin, found {n}:\n{plan}"


def assert_no_quadratic_join(df: DataFrame) -> None:
    """Assert the plan contains no cartesian / broadcast-nested-loop
    join — the O(n²) shapes every scale-path operator must avoid."""
    plan = explain_str(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"quadratic join {bad} in plan:\n{plan}"


def assert_read_schema_only(df: DataFrame, *columns: str) -> None:
    """Assert column pruning reached the scan: ReadSchema mentions
    exactly the given columns (order-insensitive)."""
    plan = explain_str(df)
    lines = [line for line in plan.splitlines() if "ReadSchema:" in line]
    assert lines, f"no ReadSchema in plan:\n{plan}"
    for line in lines:
        schema_part = line.split("ReadSchema:", 1)[1]
        got = {c.split(":")[0] for c in schema_part.split("<", 1)[-1].rstrip(">\n ").split(",") if c}
        assert got <= set(columns), f"scan reads {got - set(columns)} beyond {columns}"


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the physical plan. Counts
    only the formatted-plan detail headers ("(N) Exchange"), since each
    node also appears in the tree sketch."""
    import re

    plan = explain_str(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def assert_take_ordered(df: DataFrame) -> None:
    """Assert a sort+limit planned as TakeOrderedAndProject (per-
    partition top-k heaps), not a global sort."""
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject:\n{plan}"
