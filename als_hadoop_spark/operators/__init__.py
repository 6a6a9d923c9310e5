"""Operator library — every query surface from SURVEY.md §2 Part C.

Each submodule exports ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL twins; a query missing
from ORACLES is deliberately rows-only — sketches, LSH, random splits,
ML fits).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    als,
    analytics,
    bpe,
    dedup,
    fuzzy,
    market,
    multimodal,
    ngrams,
    pca,
    relational,
    similarity,
    sketches,
    text,
    timeseries,
    tpch,
    udfs,
)

_MODULES = (
    relational,
    analytics,
    tpch,
    market,
    bpe,
    fuzzy,
    als,
    dedup,
    similarity,
    sketches,
    text,
    ngrams,
    pca,
    multimodal,
    timeseries,
    udfs,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
