"""Unit tests: the PyArrow↔Spark type bridge (the reference's type map,
_tenant_factory.py:35-57, re-targeted at Spark) and the scalar
function surface."""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mozart_etl_spark import functions as mf
from mozart_etl_spark.types import (
    arrow_schema_to_spark,
    arrow_type_to_spark,
    spark_type_to_arrow,
)


def test_arrow_to_spark_reference_map():
    cases = [
        (pa.bool_(), T.BooleanType()),
        (pa.int8(), T.ShortType()),
        (pa.int16(), T.ShortType()),
        (pa.int32(), T.IntegerType()),
        (pa.int64(), T.LongType()),
        (pa.float32(), T.FloatType()),
        (pa.float64(), T.DoubleType()),
        (pa.decimal128(10, 2), T.DecimalType(10, 2)),
        (pa.date32(), T.DateType()),
        (pa.timestamp("us"), T.TimestampNTZType()),
        (pa.timestamp("us", tz="UTC"), T.TimestampType()),
        (pa.time64("us"), T.StringType()),  # no Spark TIME (documented)
        (pa.binary(), T.BinaryType()),
        (pa.string(), T.StringType()),
        (pa.list_(pa.int64()), T.StringType()),  # strict parity: nested -> VARCHAR
    ]
    for arrow_t, spark_t in cases:
        assert arrow_type_to_spark(arrow_t) == spark_t, str(arrow_t)


def test_arrow_to_spark_nested_when_not_strict():
    assert arrow_type_to_spark(pa.list_(pa.float32()), False) == T.ArrayType(T.FloatType())
    st = arrow_type_to_spark(pa.struct([("a", pa.int32())]), False)
    assert st == T.StructType([T.StructField("a", T.IntegerType(), True)])


def test_schema_roundtrip():
    schema = pa.schema(
        [pa.field("id", pa.int64(), nullable=False), pa.field("name", pa.string())]
    )
    spark_schema = arrow_schema_to_spark(schema)
    assert spark_schema["id"].nullable is False
    assert spark_type_to_arrow(spark_schema["name"].dataType) == pa.string()
    with pytest.raises(ValueError):
        spark_type_to_arrow(T.NullType())


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [("p1", "V1", None, 10.0, 2500000), ("p2", None, "X", 0.0, 7200000000)],
        "project_id string, plan_ver string, tag string, qty double, ts_us long",
    )
    out = df.select(
        mf.partition_key("project_id", "plan_ver").alias("pk"),
        mf.coalesce_default("tag", "UNKNOWN", "_ODV").alias("tag2"),
        F.round(mf.uplift("qty"), 2).alias("up"),
        mf.safe_div(F.lit(1.0), F.col("qty")).alias("inv"),
        mf.epoch_us_bucket("ts_us", 3_600_000_000).alias("hour_us"),
        mf.product_cast("qty").alias("qty_str"),
    ).collect()
    a, b = out
    assert a["pk"] == "p1_V1" and b["pk"] is None  # NULL-propagating ||
    assert a["tag2"] == "UNKNOWN_ODV" and b["tag2"] == "X_ODV"
    assert a["up"] == 11.0
    assert a["inv"] == 0.1 and b["inv"] is None  # divide-by-zero -> NULL
    assert a["hour_us"] == 0 and b["hour_us"] == 7200000000
    assert a["qty_str"] == "10.0"

def test_epoch_us_bucket_floors_negative_epochs(spark):
    """Pre-1970 timestamps must floor to the EARLIER bucket boundary
    (signed % sent them to the boundary after the event)."""
    from mozart_etl_spark.functions import epoch_us_bucket

    df = spark.createDataFrame([(-1,), (-1000,), (0,), (999,)], "ts_us LONG")
    got = [r["b"] for r in df.select(epoch_us_bucket("ts_us", 1000).alias("b")).collect()]
    assert got == [-1000, -1000, 0, 0]


def test_orphan_keys_counts_null_keys(spark):
    """NULL fact keys reference nothing: they are orphans and must be
    reflected in n_orphan_keys, not silently skipped by
    count_distinct; an orphan-free input still reports 0."""
    from mozart_etl_spark.operators.quality import orphan_keys

    fact = spark.createDataFrame(
        [(None,), (None,), (7,), (1,)], "user_id INT"
    )
    dim = spark.createDataFrame([(1,)], "id INT")
    row = orphan_keys(fact, dim, "user_id", "id").collect()[0]
    assert row["n_orphan_rows"] == 3  # two NULLs + key 7
    assert row["n_orphan_keys"] == 2  # {NULL, 7}
    clean = orphan_keys(spark.createDataFrame([(1,)], "user_id INT"), dim, "user_id", "id").collect()[0]
    assert (clean["n_orphan_rows"], clean["n_orphan_keys"]) == (0, 0)
