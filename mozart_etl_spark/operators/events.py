"""Event-stream analytics operators.

Reference parity: the reference's event analyses live in dbt models
over its RDB (mozart-ETL `dbt/models/`); here they are reusable
DataFrame operators so the same fold serves ad-hoc queries, models,
and tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    df: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Strict-sequence funnel: per user, the earliest timestamp at
    which each stage was reached, where stage ``i`` only counts events
    strictly after the user's stage ``i-1`` time (greedy
    earliest-qualifying, which equals the nested min-after-min
    definition — the DuckDB oracle of ``events_funnel`` uses that
    form). Events of types outside ``stages`` are ignored; ties at
    the same timestamp order by event-type string (the sort key is
    the (ts, type) struct), and a same-timestamp event can NOT
    satisfy the next stage (strict ``>``).

    Output: one row per user with a BIGINT epoch-us column per stage
    (named after the stage), NULL where the funnel stopped.

    Scale shape: ONE shuffle (the per-user collect_list groupBy); the
    fold runs JVM-side over each user's own sorted array. Per-user
    array size is bounded by events-per-user; corpora with
    pathological hot users would use the equivalent per-stage-join
    formulation instead.
    """
    if len(stages) < 1:
        raise ValueError("stages must name at least one event type")
    per_user = (
        df.filter(F.col(type_col).isin(*stages))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.sort_array(F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))).alias("seq"))
    )
    init = F.struct(
        *[F.lit(None).cast("bigint").alias(f"s{i}") for i in range(len(stages))]
    )

    def step(acc, e):
        fields = []
        for i, stage in enumerate(stages):
            cond = acc[f"s{i}"].isNull() & (e["et"] == stage)
            if i > 0:
                cond = cond & acc[f"s{i-1}"].isNotNull() & (e["ts"] > acc[f"s{i-1}"])
            fields.append(F.when(cond, e["ts"]).otherwise(acc[f"s{i}"]).alias(f"s{i}"))
        return F.struct(*fields)

    state = F.aggregate(F.col("seq"), init, step)
    return per_user.select("user_id", state.alias("_s")).select(
        "user_id",
        *[F.col("_s").getField(f"s{i}").alias(stage) for i, stage in enumerate(stages)],
    )
