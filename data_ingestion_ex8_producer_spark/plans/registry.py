"""Query registry: the driver-scored operator surface.

Every operator the engine claims (SURVEY.md §2.2 + the LLM-pipeline extras) is
registered here as a ``QuerySpec``:

* ``builder(spark, sf_dir) -> DataFrame`` — the PySpark implementation.
* ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet views, or
  ``None`` for genuinely non-SQL-expressible ops (the driver then records a
  weaker rows-only check).

Column names are part of the contract: the driver's comparator sorts columns by
name before value-hashing, so builders alias every computed column to exactly
the name the oracle uses.  Floating-point columns are rounded identically on
both sides (the two engines may sum in different orders).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register specs on import (order = rough SURVEY.md §7 phases).
_OPERATOR_MODULES = (
    "data_ingestion_ex8_producer_spark.operators.relational",
    "data_ingestion_ex8_producer_spark.operators.tpch",
    "data_ingestion_ex8_producer_spark.operators.advanced",
    "data_ingestion_ex8_producer_spark.operators.subqueries",
    "data_ingestion_ex8_producer_spark.operators.scale_patterns",
    "data_ingestion_ex8_producer_spark.operators.windows",
    "data_ingestion_ex8_producer_spark.operators.scalars",
    "data_ingestion_ex8_producer_spark.operators.analytics_ext",
    "data_ingestion_ex8_producer_spark.operators.events",
    "data_ingestion_ex8_producer_spark.operators.dedup",
    "data_ingestion_ex8_producer_spark.operators.textops",
    "data_ingestion_ex8_producer_spark.operators.similarity",
    "data_ingestion_ex8_producer_spark.operators.multimodal",
    "data_ingestion_ex8_producer_spark.operators.python_udfs",
    "data_ingestion_ex8_producer_spark.operators.pipeline",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        first_doc_line = (fn.__doc__ or "").strip().splitlines()
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tuple(tags), bench=bench,
            doc=doc or (first_doc_line[0] if first_doc_line else ""),
        )
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
