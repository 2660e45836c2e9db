"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` — every implemented query/operator (SURVEY.md §2, the
ETL-engine pipeline path, Structured Streaming drains, and the
beyond-reference LLM-pipeline operators), as (spark, sf_dir)
callables. See COVERAGE.md for the query ↔ inventory-row map.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents. Since r13
the approximate LSH/IVF operators carry FULL value oracles too
(MinHash/SimHash via a portable 60-bit md5-prefix hash — the whole
integer chain compares bit-exactly; hyperplane LSH/IVF replayed in
SQL with the seeded planes as literals); the only keys missing here
are the three genuinely sketch-based operators (HLL distinct counts,
Greenwald-Khanna approximate percentiles), whose sketches differ
across engines by design — each is pinned by an error-bound test
instead. The mapInPandas feature path (multimodal_features) carries
a full oracle: its math is integer folds + one IEEE division,
bit-exact across engines.
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
