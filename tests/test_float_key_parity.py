"""Float-key / float-measure parity pins (r13 axis).

NaN, -0.0, and +0.0 flowing through keys, orderings, and aggregates
are the numeric twin of the r12 integer-overflow axis: both engines
use TOTAL-ORDER float semantics (NaN = NaN and NaN greatest;
-0.0 = +0.0), so most of the surface converges — but three surfaces
genuinely diverge (GROUP-BY-key rendering of -0.0; interpolated
percentiles under NaN; second-moment aggregates under NaN, where
DuckDB RAISES), and one of our own kernels diverged from SQL until
this axis (the stateful running-totals pandas sum silently SKIPPED
NaN where SQL SUM poisons, and emitted 0.0 where SQL SUM of an
all-NULL key is NULL — fixed via the (_value_filled, _value_valid)
split in streaming/stateful.py plus an explicit is-NaN flag through
state and output, because the pandas->Arrow hop collapses an NaN
double to NULL in BOTH directions).

Measured contract, pinned here:

CONVERGENT (both engines identical — injected corpus-wide by the
edges variant profile, masks in tools/variant_testdata.py):
  - equality/join keys: NaN = NaN is TRUE, -0.0 = +0.0 is TRUE;
  - ORDER BY / rank / ntile: NaN sorts greatest (above +Inf),
    -0.0 ties +0.0 (tie-breaks decide, which the bank requires
    anyway);
  - comparisons: NaN > x TRUE, NaN < x FALSE (CASE range buckets put
    NaN in the ELSE bucket in both engines);
  - sum/avg/min/max: NaN poisons sum/avg/max faithfully, min ignores
    it (NaN greatest), NULLs skipped.

DIVERGENT (engine policy required):
  - GROUP BY / DISTINCT on a raw double containing -0.0: the VALUE
    SETS agree (one pooled group), but Spark normalizes the key to
    +0.0 (NormalizeFloatingNumbers) while DuckDB renders the
    first-seen bit pattern — an arrival-order-dependent -0.0. Policy:
    the bank never groups by a raw double (audited: zero queries do);
    a pipeline that must can normalize with ``x + 0.0`` (turns -0.0
    into +0.0, leaves everything else bit-identical) on both sides.
  - exact interpolated percentiles over a group containing NaN:
    Spark's ``percentile`` sorts NaN greatest and interpolates (low
    quantiles stay finite), DuckDB's ``quantile_cont`` returns NaN
    for the whole group. Policy: NaN measures are corrupt data,
    excluded from percentiles on both sides (order_price_quantiles /
    order_price_quantiles_approx carry IF(isnan(x), NULL, x) — the
    same posture as the similarity module's corrupt-vector entry
    guards).
  - second-moment aggregates (stddev/var/corr/covar) over a group
    containing NaN: Spark yields NaN, DuckDB RAISES ('STDDEV_POP is
    out of range' — found live by the edges sweep through corr's
    internal stddev). Same exclusion contract, lineitem_stats.
"""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F


NAN = float("nan")
INF = float("inf")


def _duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_join_and_equality_keys_converge(spark):
    """NaN = NaN and -0.0 = +0.0 as join keys in BOTH engines."""
    a = spark.createDataFrame([(NAN,), (-0.0,), (1.0,)], "x double")
    b = spark.createDataFrame([(NAN,), (0.0,), (2.0,)], "y double")
    got = [r.x for r in a.join(b, a.x == b.y).collect()]
    # exactly two matches: the zero pair (-0.0 = +0.0) and the NaN
    # pair (NaN = NaN) — python sort on NaN is undefined, so count
    # membership instead
    assert len(got) == 2
    assert sum(1 for v in got if v == 0) == 1
    assert sum(1 for v in got if math.isnan(v)) == 1
    duck = _duck(
        """
        SELECT a.x FROM (VALUES ('nan'::DOUBLE), (-0.0::DOUBLE), (1.0::DOUBLE)) a(x)
        JOIN (VALUES ('nan'::DOUBLE), (0.0::DOUBLE), (2.0::DOUBLE)) b(y) ON a.x = b.y
        """
    )
    vals = [v for (v,) in duck]
    assert len(vals) == 2
    assert sum(1 for v in vals if v == 0) == 1
    assert sum(1 for v in vals if math.isnan(v)) == 1


def test_group_by_double_value_sets_agree_but_zero_rendering_diverges(spark):
    """The DIVERGENT primitive: grouping pools -0.0 with +0.0 in both
    engines, but Spark NORMALIZES the emitted key to +0.0 while DuckDB
    keeps the first-seen bit pattern — so the rendered key depends on
    arrival order there. ``x + 0.0`` is the documented normalization
    for any pipeline that must group by a raw double."""
    rows = [(-0.0,), (0.0,), (NAN,), (NAN,), (1.0,)]
    df = spark.createDataFrame(rows, "x double")
    got = {
        (repr(r.x), r.n)
        for r in df.groupBy("x").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # Spark: -0.0 normalized into the +0.0 group, NaNs pooled
    assert ("0.0", 2) in got and ("nan", 2) in got and ("1.0", 1) in got

    # DuckDB pools the same VALUE SETS (same group counts)...
    duck = _duck(
        """
        SELECT x, count(*) FROM (VALUES (-0.0::DOUBLE), (0.0::DOUBLE),
            ('nan'::DOUBLE), ('nan'::DOUBLE), (1.0::DOUBLE)) t(x)
        GROUP BY x ORDER BY x
        """
    )
    assert sorted(n for _, n in duck) == [1, 2, 2]
    # ...but renders the zero group's key with FIRST-SEEN bits: -0.0
    # here (arrival-order-dependent — the reason raw-double group keys
    # are banned from the bank). signbit distinguishes the renderings.
    zero_keys = [x for x, _ in duck if x == 0]
    assert zero_keys and math.copysign(1.0, zero_keys[0]) == -1.0

    # the normalization rescue: + 0.0 turns the key into +0.0 in both
    duck_norm = _duck(
        """
        SELECT x + 0.0 AS k, count(*) FROM (VALUES (-0.0::DOUBLE), (0.0::DOUBLE)) t(x)
        GROUP BY k
        """
    )
    assert len(duck_norm) == 1 and math.copysign(1.0, duck_norm[0][0]) == 1.0


def test_ordering_rank_and_range_buckets_converge(spark):
    """NaN greatest (above +Inf), -0.0 ties +0.0, NaN < x FALSE /
    NaN > x TRUE — identical in both engines."""
    rows = [(1, -0.0), (2, 0.0), (3, NAN), (4, INF), (5, 1.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    order = [r.id for r in df.orderBy(F.asc("x"), F.asc("id")).collect()]
    assert order == [1, 2, 5, 4, 3]  # zeros tie -> id; inf; nan last
    ranks = {
        r.id: r.rk
        for r in df.select(
            "id", F.rank().over(Window.orderBy("x")).alias("rk")
        ).collect()
    }
    assert ranks[1] == ranks[2] == 1 and ranks[3] == 5
    buckets = {
        r.id: r.b
        for r in df.select(
            "id", F.when(F.col("x") < 0.5, "lo").otherwise("hi").alias("b")
        ).collect()
    }
    assert buckets[3] == "hi"  # NaN < 0.5 is FALSE

    duck = _duck(
        """
        SELECT id FROM (VALUES (1, -0.0::DOUBLE), (2, 0.0::DOUBLE),
            (3, 'nan'::DOUBLE), (4, 'infinity'::DOUBLE), (5, 1.0::DOUBLE)) t(id, x)
        ORDER BY x ASC, id ASC
        """
    )
    assert [i for (i,) in duck] == [1, 2, 5, 4, 3]
    duck_rank = _duck(
        """
        SELECT id, rank() OVER (ORDER BY x) FROM (VALUES (1, -0.0::DOUBLE),
            (2, 0.0::DOUBLE), (3, 'nan'::DOUBLE), (4, 'infinity'::DOUBLE),
            (5, 1.0::DOUBLE)) t(id, x)
        """
    )
    dr = dict(duck_rank)
    assert dr[1] == dr[2] == 1 and dr[3] == 5
    duck_cmp = _duck("SELECT 'nan'::DOUBLE < 0.5, 'nan'::DOUBLE > 0.5")
    assert duck_cmp == [(False, True)]


def test_aggregates_converge_on_nan(spark):
    """sum/avg/max poison to NaN, min ignores NaN (greatest) — both
    engines; NULLs skipped as usual."""
    df = spark.createDataFrame([(1.0,), (NAN,), (2.0,), (None,)], "x double")
    r = df.agg(
        F.sum("x").alias("s"), F.avg("x").alias("a"),
        F.min("x").alias("lo"), F.max("x").alias("hi"),
    ).collect()[0]
    assert math.isnan(r.s) and math.isnan(r.a) and r.lo == 1.0 and math.isnan(r.hi)
    (ds, da, dlo, dhi), = _duck(
        """
        SELECT sum(x), avg(x), min(x), max(x)
        FROM (VALUES (1.0::DOUBLE), ('nan'::DOUBLE), (2.0::DOUBLE), (NULL::DOUBLE)) t(x)
        """
    )
    assert math.isnan(ds) and math.isnan(da) and dlo == 1.0 and math.isnan(dhi)


def test_percentile_under_nan_diverges_and_the_exclusion_restores_parity(spark):
    """The SECOND divergent primitive: Spark percentile interpolates
    over an NaN-greatest sort (median of [1,2,3,NaN] = 2.5), DuckDB
    quantile_cont NaN-poisons the whole group. The bank's exclusion
    contract (IF(isnan(x), NULL, x)) restores exact parity."""
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (NAN,)], "x double")
    spark_raw = df.agg(F.expr("percentile(x, 0.5)").alias("m")).collect()[0].m
    (duck_raw,), = _duck(
        "SELECT quantile_cont(x, 0.5) FROM (VALUES (1.0::DOUBLE), (2.0::DOUBLE), (3.0::DOUBLE), ('nan'::DOUBLE)) t(x)"
    )
    # the divergence itself, pinned so an engine upgrade that changes
    # either side is noticed
    assert spark_raw == 2.5
    assert math.isnan(duck_raw)

    guarded = df.agg(
        F.expr("percentile(IF(isnan(x), NULL, x), 0.5)").alias("m")
    ).collect()[0].m
    (duck_guarded,), = _duck(
        """
        SELECT quantile_cont(CASE WHEN isnan(x) THEN NULL ELSE x END, 0.5)
        FROM (VALUES (1.0::DOUBLE), (2.0::DOUBLE), (3.0::DOUBLE), ('nan'::DOUBLE)) t(x)
        """
    )
    assert guarded == duck_guarded == 2.0


def test_stateful_running_totals_nan_and_all_null_semantics(spark):
    """The kernel-level fix this axis forced: the stateful pandas sum
    must match SQL SUM — NaN POISONS a key's total (pandas' default
    skipna sum silently dropped it), an all-NULL key's total is NULL
    (the kernel emitted 0.0), and NULL values are skipped. Pinned on
    the batch-equivalent drain of the real operator."""
    import pandas as pd

    from mozart_etl_spark.streaming.stateful import running_user_totals

    rows = [
        (1, 10.0, 1_000_000), (1, NAN, 2_000_000), (1, 5.0, 3_000_000),
        (2, None, 1_000_000), (2, None, 2_000_000),
        (3, 7.5, 1_000_000), (3, None, 2_000_000),
    ]
    src = spark.createDataFrame(rows, "user_id long, value double, ts_us long")
    import tempfile, os, uuid

    d = tempfile.mkdtemp()
    src.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "ev"))
    stream = (
        spark.readStream.schema("user_id long, value double, ts_us long")
        .parquet(os.path.join(d, "ev"))
    )
    name = f"fkp_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {r.user_id: r.total_value for r in spark.table(name).collect()}
    assert math.isnan(out[1]), "NaN must poison the running total like SQL SUM"
    assert out[2] is None, "all-NULL key must yield NULL like SQL SUM"
    assert out[3] == 7.5, "NULLs skipped, finite values summed"


def test_double_stringification_diverges_pinned(spark):
    """CAST(double AS VARCHAR) is ENGINE-RENDERED: Spark uses Java's
    Double.toString ('NaN', 'Infinity', scientific from 1e7), DuckDB
    its shortest-roundtrip form ('nan', 'inf', plain decimals longer).
    Pinned as a primitive so no future query stringifies a raw double
    in an oracle-checked column (profile_columns documents the same:
    its min/max stringification profiles key/date/flag columns, never
    raw doubles)."""
    vals = spark.createDataFrame(
        [(NAN,), (INF,), (1.23e7,)], "x double"
    ).select(F.col("x").cast("string").alias("s")).collect()
    spark_r = {v.s for v in vals}
    assert "NaN" in spark_r and "Infinity" in spark_r
    duck = {
        v
        for (v,) in _duck(
            "SELECT CAST(x AS VARCHAR) FROM (VALUES ('nan'::DOUBLE), ('infinity'::DOUBLE), (1.23e7::DOUBLE)) t(x)"
        )
    }
    assert "nan" in duck and "inf" in duck
    assert spark_r != duck  # the divergence this pin exists to remember


def test_second_moment_under_nan_diverges_and_the_exclusion_restores_parity(spark):
    """The THIRD divergent surface (found live by the edges sweep):
    second-moment aggregates under an NaN measure — Spark's
    stddev/var/corr/covar yield NaN, DuckDB RAISES ('STDDEV_POP is out
    of range', surfacing through corr's internal stddev). Exclusion
    (IF(isnan(x), NULL, x)) is the contract on both sides
    (lineitem_stats)."""
    df = spark.createDataFrame([(1.0, 2.0), (NAN, 3.0), (2.0, 5.0)], "x double, y double")
    r = df.agg(
        F.stddev_samp("x").alias("sd"), F.corr("x", "y").alias("c")
    ).collect()[0]
    assert math.isnan(r.sd) and math.isnan(r.c)
    try:
        _duck(
            "SELECT stddev_samp(x), corr(x, y) FROM (VALUES "
            "(1.0::DOUBLE, 2.0::DOUBLE), ('nan'::DOUBLE, 3.0::DOUBLE), "
            "(2.0::DOUBLE, 5.0::DOUBLE)) t(x, y)"
        )
        raised = False
    except Exception:
        raised = True
    assert raised, "DuckDB is expected to RAISE on NaN second moments"

    guarded = df.agg(
        F.expr("stddev_samp(IF(isnan(x), NULL, x))").alias("sd"),
        F.expr("corr(IF(isnan(x), NULL, x), y)").alias("c"),
    ).collect()[0]
    (dsd, dc), = _duck(
        "SELECT stddev_samp(CASE WHEN isnan(x) THEN NULL ELSE x END), "
        "corr(CASE WHEN isnan(x) THEN NULL ELSE x END, y) FROM (VALUES "
        "(1.0::DOUBLE, 2.0::DOUBLE), ('nan'::DOUBLE, 3.0::DOUBLE), "
        "(2.0::DOUBLE, 5.0::DOUBLE)) t(x, y)"
    )
    assert abs(guarded.sd - dsd) < 1e-12 and abs(guarded.c - dc) < 1e-12


def test_string_collation_converges_including_astral_planes(spark):
    """Companion convergence pin (r13, correcting a stale r12 claim):
    Spark 4.x's default UTF8_BINARY collation compares UTF-8 BYTES —
    exactly DuckDB's order — so ORDER BY, array_sort, min/max, and
    `<` on raw strings agree across engines INCLUDING astral-plane
    and private-use codepoints (the r12 PMI note claimed a
    UTF-16-code-unit divergence where surrogate-coded astral chars
    would sort below U+E000..U+FFFF; measured false here). The PMI
    cap keeps its md5 ordering anyway — as a skew-independent uniform
    sample, not as a divergence workaround."""
    import duckdb

    vals = ["a", "z", "\ue000", "\uffe9", "\U00010000", "\U0001F600"]
    df = spark.createDataFrame([(v,) for v in reversed(vals)], "s string")
    assert [r.s for r in df.orderBy("s").collect()] == vals
    assert df.agg(F.array_sort(F.collect_list("s")).alias("a")).collect()[0].a == vals
    mn, mx = df.agg(F.min("s"), F.max("s")).collect()[0]
    assert (mn, mx) == (vals[0], vals[-1])
    # astral > BMP-high under byte order (UTF-16 code-unit order
    # would say the opposite)
    astral, bmp_high = chr(0x1F600), chr(0xFFE9)
    assert df.selectExpr(f"'{astral}' > '{bmp_high}' AS c").collect()[0].c is True

    con = duckdb.connect()
    codes = ",".join(f"(chr({ord(v)}))" for v in reversed(vals))
    duck = [v for (v,) in con.execute(
        f"SELECT s FROM (VALUES {codes}) t(s) ORDER BY s").fetchall()]
    con.close()
    assert duck == vals
