"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` — every implemented query/operator (SURVEY.md §2 + the
beyond-reference LLM-pipeline operators), as (spark, sf_dir) callables.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents; keys missing
here (approximate operators: MinHash-LSH, SimHash) get the weaker
rows-only check by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mozart_etl_spark import querybank


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's mart_item_master chain (SURVEY.md §7.3)
    on /root/testdata/sf0.001."""
    return querybank.queries()["mart_item_master"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return querybank.queries()


def oracle_sql() -> dict[str, str]:
    return querybank.oracle_sql()
