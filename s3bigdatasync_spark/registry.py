"""Central query/oracle registry — the driver contract's backing store.

Merges every operator module's QUERIES/ORACLES; __spark_entry__.py re-exports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import llm_corpus
from .operators import (
    analytics,
    cost,
    dedup,
    expressions,
    joins,
    limits,
    multimodal,
    relational,
    similarity,
    skew,
    star,
    stats,
    text,
    verify_ops,
    windows,
)

_MODULES = [
    stats,
    windows,
    joins,
    expressions,
    limits,
    text,
    dedup,
    similarity,
    multimodal,
    verify_ops,
    skew,
    cost,
    analytics,
    relational,
    llm_corpus,
    star,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        for name, fn in m.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    return out
