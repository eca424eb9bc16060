"""Query registry: each operator module contributes QueryDef entries;
__spark_entry__ assembles them into the driver contract."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → rows-only check


def build(defs: list[QueryDef]):
    queries = {d.name: d.fn for d in defs}
    oracles = {d.name: d.oracle for d in defs if d.oracle is not None}
    return queries, oracles
