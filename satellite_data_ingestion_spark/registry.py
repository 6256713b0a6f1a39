"""Central query registry.

Each operator module registers its queries under the stable IDs of
``SURVEY.md §2`` via the :func:`register` decorator.  A query is a callable
``(spark, sf_dir) -> DataFrame``; when its semantics are ANSI-SQL
expressible it also carries an ``oracle`` SQL string that DuckDB can run on
the same parquet tables for the driver's hash-match correctness gate.

Column-name discipline: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL — the driver sorts columns
by name before hashing values.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import registers queries (side-effect registration).
_QUERY_MODULES = [
    "satellite_data_ingestion_spark.operators.scans",
    "satellite_data_ingestion_spark.operators.filters",
    "satellite_data_ingestion_spark.operators.joins",
    "satellite_data_ingestion_spark.operators.aggregates",
    "satellite_data_ingestion_spark.operators.windows",
    "satellite_data_ingestion_spark.operators.setops",
    "satellite_data_ingestion_spark.operators.scale",
    "satellite_data_ingestion_spark.functions.scalar",
    "satellite_data_ingestion_spark.functions.udf",
    "satellite_data_ingestion_spark.sources.binary",
    "satellite_data_ingestion_spark.sources.catalog_json",
    "satellite_data_ingestion_spark.sources.sinks",
    "satellite_data_ingestion_spark.streaming.windows",
    "satellite_data_ingestion_spark.streaming.state",
    "satellite_data_ingestion_spark.streaming.custom_state",
    "satellite_data_ingestion_spark.streaming.joins",
    "satellite_data_ingestion_spark.sources.python_source",
    "satellite_data_ingestion_spark.llm.dedup",
    "satellite_data_ingestion_spark.llm.simsearch",
    "satellite_data_ingestion_spark.llm.textstats",
    "satellite_data_ingestion_spark.llm.multimodal",
    "satellite_data_ingestion_spark.plans.pipeline",
    "satellite_data_ingestion_spark.plans.tpch",
]


def register(name: str, oracle: Optional[str] = None):
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent) so the registry is complete."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # Module not built yet (incremental construction); skip.
            pass


def queries() -> dict[str, QueryFn]:
    load_all()
    return {k: v.fn for k, v in sorted(_REGISTRY.items())}


def oracles() -> dict[str, str]:
    load_all()
    return {k: v.oracle for k, v in sorted(_REGISTRY.items()) if v.oracle is not None}


def spec(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
