"""Cross-engine DECIMAL(p,s) arithmetic contract (r14 axis).

SURVEY §7.4 flags the reference's Trino models computing
``demand_qty * 1.1`` where DECIMAL x DECIMAL stays decimal; Spark's
literal typing and result p/s rules differ from Trino's AND from
DuckDB's, so decimal math needed its own measured contract the way
the overflow (r12) and float-key (r13) axes got theirs. Every case
below is a live measurement on pyspark 4.1 / duckdb (probed r14):

- MULTIPLY: ``DECIMAL(12,2) * DECIMAL(2,1)`` is value-identical —
  Spark types it (p1+p2+1, s1+s2) = (15,3), DuckDB (w1+w2, s1+s2) =
  (14,3); same digits, same scale. A bare ``x * 1.1`` literal types
  the same way in both (1.1 is DECIMAL(2,1) in both parsers).
- MULTIPLY WIDTH BOUND: DuckDB executes a multiply whose result
  width exceeds 18 in a wider register ONLY if the declared types
  demand it; ``DECIMAL(10,2) * DECIMAL(10,2)`` overflows DuckDB's
  width-18 register (OutOfRangeException) where Spark widens to
  (21,4) and returns the product. Oracle-checked decimal products
  must keep w1+w2 <= 18.
- SUM keeps the addend scale in both engines (Spark precision +10,
  DuckDB precision 38); values identical, and because both
  collectors return scale-faithful ``decimal.Decimal``, trailing
  zeros render identically in the driver hash.
- DOUBLE -> DECIMAL cast: both round half away from zero (2.5 -> 3,
  -2.5 -> -3, 0.125 -> 0.13) — binary-representable halves agree.
- DECIMAL -> lower-scale DECIMAL cast DIVERGES on exact halves:
  Spark casts HALF_UP (2.345 -> 2.35), DuckDB rounds the half DOWN
  (2.345 -> 2.34, 2.355 -> 2.35). The contract: scale reduction in
  certified queries goes through ``round(x, s)`` FIRST (both engines
  round decimals half-away-from-zero — 2.345 -> 2.35 both) and only
  then casts to the target type, which is exact.
- DIVISION / AVG over decimal are banned in certified queries:
  DuckDB returns DOUBLE for both (7.00/3.00 = 2.3333335, avg ->
  1.65), Spark DECIMAL(27,15) / (p+4, s+4) — typing divergence
  pinned in test_overflow_parity.py::
  test_decimal_division_result_types_diverge_by_design.

The registered ``decimal_uplift_totals`` query exercises the whole
contract end-to-end (multiply, round-then-cast, sum) and is
oracle-compared here on BOTH the driver data and the NaN-injected
variant profile (NaN prices are excluded as corrupt data before
entering decimal space — ANSI Spark errors on CAST(NaN AS DECIMAL)).

Reference anchor: DECIMAL ingest surface
`/root/reference/mozart_etl/code_locations/_tenant_factory.py:49-50`.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest

from tests.oracle_harness import compare

from mozart_etl_spark.querybank import REGISTRY, _ensure_loaded

from .conftest import SF_CORRECT, SF_SMOKE

_ensure_loaded()


def _duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchone()
    finally:
        con.close()


def _spark_row(spark, sql: str):
    return tuple(spark.sql(sql).collect()[0])


def test_decimal_multiply_value_identical(spark):
    sql = (
        "SELECT CAST(123.45 AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1)),"
        "       CAST(-123.45 AS DECIMAL(12,2)) * 1.1"
    )
    sp, dk = _spark_row(spark, sql), _duck(sql)
    assert sp == dk == (Decimal("135.795"), Decimal("-135.795"))
    # Spark's result precision is p1+p2+1 with scale s1+s2
    assert spark.sql(sql).schema.fields[0].dataType.simpleString() == "decimal(15,3)"


def test_decimal_multiply_width_bound_duckdb_overflows_past_18(spark):
    """w1+w2 > 18: Spark widens and returns the product; DuckDB's
    width-18 multiply register overflows. Certified queries keep
    products inside 18 total digits so the oracle can run at all."""
    sql = "SELECT CAST(99999999.99 AS DECIMAL(10,2)) * CAST(99999999.99 AS DECIMAL(10,2))"
    assert _spark_row(spark, sql) == (Decimal("9999999998000000.0001"),)
    with pytest.raises(duckdb.OutOfRangeException):
        _duck(sql)


def test_decimal_sum_keeps_scale_and_trailing_zeros(spark):
    sql = (
        "SELECT CAST(SUM(x) AS DECIMAL(38,2)) FROM ("
        "SELECT CAST(1.10 AS DECIMAL(12,2)) AS x "
        "UNION ALL SELECT CAST(2.90 AS DECIMAL(12,2)))"
    )
    sp, dk = _spark_row(spark, sql), _duck(sql)
    assert sp == dk == (Decimal("4.00"),)
    # scale-faithful rendering is what makes the driver hash stable
    assert str(sp[0]) == str(dk[0]) == "4.00"


def test_double_to_decimal_cast_rounds_half_away_on_both(spark):
    sql = (
        "SELECT CAST(CAST(2.5 AS DOUBLE) AS DECIMAL(3,0)),"
        "       CAST(CAST(-2.5 AS DOUBLE) AS DECIMAL(3,0)),"
        "       CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(5,2))"
    )
    expected = (Decimal("3"), Decimal("-3"), Decimal("0.13"))
    assert _spark_row(spark, sql) == _duck(sql) == expected


def test_decimal_downscale_cast_diverges_round_then_cast_agrees(spark):
    """The measured divergence this axis exists for: a bare
    lower-scale CAST splits the engines on exact decimal halves, the
    round-then-cast form is the contract that doesn't."""
    bare = "SELECT CAST(CAST(2.345 AS DECIMAL(5,3)) AS DECIMAL(4,2))"
    assert _spark_row(spark, bare) == (Decimal("2.35"),)  # HALF_UP
    assert _duck(bare) == (Decimal("2.34"),)  # half rounded down
    fixed = "SELECT CAST(round(CAST(2.345 AS DECIMAL(5,3)), 2) AS DECIMAL(4,2))"
    assert _spark_row(spark, fixed) == _duck(fixed) == (Decimal("2.35"),)
    neg = "SELECT CAST(round(CAST(-2.345 AS DECIMAL(5,3)), 2) AS DECIMAL(4,2))"
    assert _spark_row(spark, neg) == _duck(neg) == (Decimal("-2.35"),)


def test_decimal_uplift_totals_oracle_on_driver_data(spark):
    spec = REGISTRY["decimal_uplift_totals"]
    ok, msg = compare(spark, SF_CORRECT, spec.fn, spec.oracle)
    assert ok, msg


def test_decimal_uplift_totals_oracle_on_nan_variant(spark, tmp_path_factory):
    """The edges profile injects NaN into l_extendedprice; the
    IF(isnan) exclusion must keep both engines in (identical) decimal
    space rather than splitting on Spark's ANSI cast error."""
    from tools.variant_testdata import main as make_variant

    vdir = str(tmp_path_factory.mktemp("variant_decimal") / "sf")
    make_variant(SF_SMOKE, vdir)
    spec = REGISTRY["decimal_uplift_totals"]
    ok, msg = compare(spark, vdir, spec.fn, spec.oracle)
    assert ok, msg
