"""Golden tests: every registered query with an oracle must match
DuckDB exactly at sf0.001 (fast) — the driver runs the same comparison
at sf0.01."""

from __future__ import annotations

import pytest

from mozart_etl_spark.querybank import REGISTRY, _ensure_loaded

from .oracle_harness import compare

_ensure_loaded()
ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert df.schema is not None
    assert rows is not None


#: Timestamp/date-deriving queries re-checked under a non-UTC session
#: start: a production cluster defaults to the host zone (e.g.
#: Asia/Seoul), and hour/date extraction would silently shift there
#: if the engine relied on the session default. `io.table` pins the
#: session zone to UTC at load time by design (io.py) so every bank
#: result is timezone-deterministic; these tests pin that contract.
TZ_SENSITIVE = ["latest_event_per_user", "orders_by_year", "asof_click_view"]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_oracle_match_under_non_utc_session_start(spark, sf_dir, name):
    spec = REGISTRY[name]
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert ok, f"{name} under Asia/Seoul session start: {msg}"


def test_io_table_normalizes_session_timezone(spark, sf_dir):
    from mozart_etl_spark import io

    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        io.table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
