"""Data-quality operators: column profiling and referential-integrity
checks — the validation pass an ETL engine runs after every load and
before publishing a mart (the reference delegates this to ad-hoc Trino
queries; here it is a first-class distributed operator).

Both operators reduce arbitrarily large inputs to tiny outputs (one
row per column / one row total) with partial-aggregable plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count,
    min/max (as strings, so heterogeneous column types share one output
    schema). Rendering contract (r13 float-key axis): the
    stringification is ENGINE-rendered, and Spark and DuckDB disagree
    on doubles ('NaN'/'Infinity'/scientific-from-1e7 vs
    'nan'/'inf'/plain decimals — pinned in
    tests/test_float_key_parity.py), so profile key/date/flag columns,
    or accept engine-local rendering for double columns; min/max of a
    ±0.0 tie is additionally arrival-order-dependent in BOTH engines
    (normalize with ``x + 0.0`` first if it matters). One aggregation
    pass over the table; the multi-column
    exact ``count(distinct)`` plans as a single Expand + partial
    aggregate (rows × #columns intermediate). At 100 TB swap
    ``count_distinct`` for ``approx_count_distinct`` — the profile is
    diagnostic, and HLL cuts the expand cost to a constant-size sketch
    per column.

    Snapshot assumption: the profile runs as TWO scans of ``df`` (a
    plain pass and a distinct pass — see the comment below for why).
    On a non-deterministic or concurrently-changing source the passes
    can observe different rows and the profile can be internally
    inconsistent (e.g. ``n_distinct > n_rows``); persist / checkpoint
    such an input before profiling. Parquet snapshots (every caller
    in this engine) are stable across scans.
    """
    columns = columns or df.columns
    # Two single-row passes instead of one combined agg: mixing
    # multi-column count(distinct) with plain aggregates makes Catalyst
    # plan ONE Expand that multiplies every input row by #distinct
    # columns + 1 before the partial aggregate. Splitting keeps the
    # plain pass Expand-free and lets the distinct pass expand without
    # dragging min/max/null state through it — measured 2.3s -> 1.0s
    # at sf0.1 (the jobs also run concurrently). Both scans prune to
    # the profiled columns, so the extra read is columnar and cheap at
    # any scale; joining two 1-row frames costs nothing.
    plain = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")]
    for c in columns:
        col = F.col(c)
        plain += [
            F.sum(col.isNull().cast("bigint")).cast("bigint").alias(f"_nulls_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    distincts = df.agg(
        *[F.count_distinct(F.col(c)).cast("bigint").alias(f"_dist_{c}") for c in columns]
    )
    wide = df.agg(*plain).crossJoin(F.broadcast(distincts))
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in columns
    )
    return wide.select(
        F.col("_n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def orphan_keys(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Referential-integrity check: fact rows whose key has no match in
    the dimension. Returns one row — orphan row count and distinct
    orphan keys. A left-anti equi-join (shuffle- or broadcast-shaped by
    AQE) + a partial-aggregable count: no row expansion at any scale.
    NULL keys count as orphans (they reference nothing).
    """
    orphans = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates(), fact_key, "left_anti"
    )
    # count_distinct skips NULLs, but NULL keys ARE orphans per the
    # contract above — count the NULL group explicitly as one key
    return orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orphan_rows"),
        (
            F.count_distinct(F.col(fact_key))
            + F.coalesce(F.max(F.col(fact_key).isNull().cast("bigint")), F.lit(0))
        ).cast("bigint").alias("n_orphan_keys"),
    )
