"""Central query registry.

Every operator module exposes ``QUERIES`` (name → (spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → equivalent DuckDB SQL; absent for genuinely
non-SQL-expressible operators → driver records a rows-only check).
This module merges them and is the single source for ``__spark_entry__``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Extended as the build widens (SURVEY §7.1 build order). Imports fail loud:
# a broken module must break the harness, not silently drop its queries.
_MODULE_PATHS = [
    "operators.gold",
    "operators.relational",
    "operators.aggregates",
    "operators.timeseries",
    "operators.joins",
    "operators.skew",
    "operators.finance",
    "operators.features",
    "operators.sketches",
    "sources.readers",
    "sources.sinks",
    "sources.bucketing",
    "functions.scalar",
    "functions.text",
    "ml",
    "streaming.pipelines",
    "streaming.lifecycle",
    "llmdata.dedup",
    "llmdata.similarity",
    "llmdata.clustering",
    "llmdata.textstats",
    "llmdata.multimodal",
    "llmdata.corpus",
    "llmdata.sampling",
]


def _modules():
    return [
        importlib.import_module(f"{__package__}.{path}") for path in _MODULE_PATHS
    ]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            out[name] = fn
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            if name in out:
                raise ValueError(f"duplicate oracle name {name!r} in {mod.__name__}")
            out[name] = sql.strip()
    return out
