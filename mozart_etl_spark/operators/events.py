"""Event-stream analytics operators.

Reference parity: the reference's event analyses live in dbt models
over its RDB (mozart-ETL `dbt/models/`); here they are reusable
DataFrame operators so the same fold serves ad-hoc queries, models,
and tests.

**NULL-identity policy** (r9 orphan-FK axis, engine-wide): operators
that RELATE events to each other within an identity partition —
sessions, funnels, transitions, inter-visit gaps, retention streaks,
as-of matches — require that identity and EXCLUDE NULL-key events
explicitly: window ``partitionBy``/``groupBy`` would otherwise pool
every anonymous event into one phantom participant, fabricating
relationships between different real people (and minting the hottest
grouping key in a 100 TB corpus), while SQL's equi-join formulations
of the same analyses drop NULL keys — two engines, two silent
answers. Operators that AGGREGATE independently within groups
(counts, histograms, latest-per-key, running totals) keep the NULL
group — faithful SQL GROUP BY semantics, identical in both engines.
Each operator's docstring states which side of the line it is on;
the edges variant sweep (1-in-43 NULL user_id) pins the contracts.
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

    NULL-ts policy (engine-wide, streaming/events.py): an event with
    no timestamp has no position in the sequence, so NULL-ts events
    are excluded explicitly — the fold's NULL comparisons would
    no-op them anyway, but a NULL-ts event must also never occupy a
    stage slot or lead the sorted array, so the filter is the
    contract, not an optimization.

    NULL-identity policy (r9 orphan-FK axis): a funnel participant
    requires an identity — events with NULL ``user_col`` are excluded
    explicitly. The alternatives are both wrong: pooling orphan
    events into one phantom "NULL user" journey (what a bare
    ``groupBy`` does — Spark and SQL group NULLs together) conflates
    unrelated anonymous sessions into a single fake participant that
    marches through every stage, and at 100 TB that phantom is also
    the hottest grouping key in the corpus; while SQL's equi-join
    funnel form (the oracle's ``JOIN ... USING (user_id)``
    min-after-min chain) silently counts the NULL group at stage 1
    but drops it from stage 2 onward, because NULL never equals NULL
    — an inconsistent hybrid. The explicit filter makes both engines
    state the same decision. Pinned by
    ``test_funnel_null_identity_events_are_excluded`` and the edges
    variant sweep (1-in-43 NULL user_id injection).

    Scale shape: ONE shuffle (the per-user collect_list groupBy); the
    fold runs JVM-side over each user's own sorted array. Per-user
    array size is bounded by events-per-user; corpora with
    pathological hot users would use the equivalent per-stage-join
    formulation instead.
    """
    if len(stages) < 1:
        raise ValueError("stages must name at least one event type")
    per_user = (
        df.filter(
            F.col(type_col).isin(*stages)
            & F.col(ts_col).isNotNull()
            & F.col(user_col).isNotNull()
        )
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


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """As-of join, backward-inclusive: for every left row, the most
    recent right row with the same key at or before the left row's
    timestamp (``right_ts <= left_ts``). SQL surfaces without a native
    ASOF JOIN can't express this without a per-row correlated subquery
    or a range join that explodes on dense histories; here it is the
    union + running-max trick — tag both sides, union, and take a
    running max of the right-side (ts, payload) struct over a window
    keyed on the join key and ordered by (ts, side) with right rows
    first at equal timestamps.

    Output: every left row plus ``asof_ts`` (BIGINT-comparable
    ``right_ts`` of the match, NULL when no right row precedes) and
    the requested right ``payload_cols`` prefixed ``asof_`` (NULL
    likewise). When several right rows share (key, ts), the match is
    the one with the greatest payload tuple — a deterministic
    tiebreak.

    NULL-ts policy (engine-wide, streaming/events.py): right rows
    with a NULL timestamp are unmatchable ("at or before" is
    undefined) and are dropped explicitly — without the drop a key
    whose ONLY right row is NULL-ts would hand that row's payload to
    every left row with ``asof_ts`` NULL, because a struct with a
    NULL leading field still participates in ``max``. Left rows are
    PRESERVED per the operator contract: a NULL-ts left row sorts
    before every timestamped right row (NULLS FIRST asc), so it gets
    the correct no-match NULLs.

    NULL-key policy (r9 orphan-FK axis): an as-of join is an
    equi-key join in time — and SQL equality never matches a NULL
    key, while this window formulation's ``partitionBy`` POOLS NULL
    keys into one partition, so without a guard a NULL-key left row
    would silently match a NULL-key right row that no join engine
    would pair. Right rows with any NULL key component are therefore
    dropped explicitly (unmatchable); NULL-key left rows are
    preserved with no-match NULLs — they pool in the NULL partition,
    but with no right rows left there the running max is NULL, which
    is exactly the SQL result. Pinned by
    ``test_asof_null_key_left_preserved_right_dropped``.

    Scale shape: ONE shuffle (the window partition on the key), no
    range-join row explosion; identical cost profile at 100 TB. Cites
    the reference's SQL-only surface (mozart-ETL dbt models) which has
    no as-of equivalent — this operator is part of the engine's
    event-analytics value-add.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    lpay = [c for c in left.columns if c not in keys]
    r_struct = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    r_not_null = F.col(right_ts).isNotNull()
    for k in keys:
        r_not_null = r_not_null & F.col(k).isNotNull()
    r_side = right.filter(r_not_null).select(
        *keys,
        F.col(right_ts).alias("_ord_ts"),
        F.lit(1).alias("_is_right"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("_ord_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        *lpay,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_ord_ts"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_side.unionByName(r_side).withColumn("_m", F.max("_r").over(w))
    return (
        matched.filter(F.col("_is_right") == 0)
        .select(
            *keys,
            *lpay,
            F.col("_m._ts").alias("asof_ts"),
            *[F.col("_m").getField(c).alias(f"asof_{c}") for c in payload_cols],
        )
    )
