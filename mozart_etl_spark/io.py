"""Table loaders for the synthetic testdata layout.

``/root/testdata/sf*/{name}.parquet`` — TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings`` (see TESTDATA.md).

Two normalizations happen here so every downstream query is
deterministic and portable:

1. **Session timezone pinned to UTC** before any read, so
   TIMESTAMP (LTZ) values collected by any harness render identically
   to the naive timestamps a SQL oracle (DuckDB) produces.
2. **Nanosecond timestamps**: ``events.ts`` is parquet
   TIMESTAMP(NANOS), which Spark's vectorized reader rejects
   (PARQUET_TYPE_ILLEGAL). We flip the dynamic conf
   ``spark.sql.legacy.parquet.nanosAsLong`` and expose the column as
   ``ts_us`` (epoch **microseconds**, BIGINT) — truncation matches
   DuckDB's ``CAST(ts AS TIMESTAMP)``. Working in integer epoch space
   also keeps every time computation timezone-proof.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CORE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
AUX_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = CORE_TABLES + AUX_TABLES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    Column pruning and predicate pushdown reach the parquet scan
    because this is a plain ``spark.read.parquet`` — callers should
    ``select``/``filter`` on the result and let Catalyst push down.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


def _has_nanos_timestamp(path: str) -> bool:
    """Cheap parquet-footer check (no Spark job, no noisy task failure)."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
        return any(str(f.type) == "timestamp[ns]" for f in schema)
    except Exception:
        return False


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    if _has_nanos_timestamp(path):
        # Spark's parquet reader rejects TIMESTAMP(NANOS) outright;
        # nanosAsLong (dynamic conf) reads it as epoch-ns BIGINT.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    df = normalize_ts_us(df)
    # stable column order: event_id, ts_us, user_id, event_type, value, props
    cols = [c for c in ("event_id", "ts_us", "user_id", "event_type", "value", "props") if c in df.columns]
    return df.select(*cols)


def normalize_ts_us(df: DataFrame, col: str = "ts") -> DataFrame:
    """Replace ``col`` with ``ts_us`` (epoch-microsecond BIGINT),
    whatever physical form the parquet writer chose:

    - epoch-ns BIGINT (the ``nanosAsLong`` legacy read of
      TIMESTAMP(NANOS)) → integer div by 1000;
    - TIMESTAMP_NTZ (parquet ``timestamp[us]`` without a zone, the
      Spark 4 default read) → cast to TIMESTAMP first; the session
      timezone is pinned to UTC, so the cast is the identity on the
      stored wall-clock micros;
    - TIMESTAMP (zone-tagged parquet) → ``unix_micros`` directly.
    """
    dt = dict(df.dtypes).get(col)
    if dt is None:
        return df
    if dt == "bigint":  # nanosAsLong path: col is epoch-ns
        # `div` truncates toward zero — deliberately: DuckDB's own
        # parquet TIMESTAMP(NANOS) -> TIMESTAMP conversion truncates
        # the same way (verified: -1500 ns -> -1 us, not floor's -2),
        # so truncation is what keeps pre-1970 sub-microsecond values
        # oracle-consistent across engines
        return df.withColumn("ts_us", F.expr(f"{col} div 1000")).drop(col)
    if dt == "timestamp_ntz":
        return df.withColumn("ts_us", F.unix_micros(F.col(col).cast("timestamp"))).drop(col)
    return df.withColumn("ts_us", F.unix_micros(F.col(col))).drop(col)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in ALL_TABLES}
