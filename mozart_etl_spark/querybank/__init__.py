"""Query bank: named queries with DuckDB oracle SQL.

Each entry pairs an idiomatic-PySpark implementation (DataFrame API,
Catalyst-optimizable) with an ANSI-SQL oracle string that DuckDB can
run against the same parquet tables. The driver harness compares the
two at sf=0.01 (row count + schema + order-insensitive value hash).

Determinism rules every query follows (so hashes are stable):

- every computed column is aliased identically on both sides;
- floating-point aggregates are ``round()``-ed on both sides (raw
  column passthrough is fine — same bits either way);
- timestamps are returned as epoch-microsecond BIGINTs, DATEs, or
  formatted strings — never engine-rendered local timestamps;
- ``LIMIT`` always follows a total order (explicit tie-breakers);
- integer-typed results are cast to BIGINT on both sides (DuckDB
  ``count``/``sum``/``rank`` widths differ from Spark's defaults).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: @register calls populate REGISTRY
    from . import relational  # noqa: F401
    from . import relational_adv  # noqa: F401
    from . import llmops  # noqa: F401
    from . import engine  # noqa: F401
    from . import streaming_queries  # noqa: F401

    _LOADED = True
