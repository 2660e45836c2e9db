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
