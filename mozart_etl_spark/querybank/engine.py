"""Engine-path queries: the full ETL pipeline run through the driver
correctness gate.

Unlike the rest of the query bank (plain DataFrame plans), these
entries execute the actual engine — tenant spec → extract with
projection/tenant-filter → raw-layer materialization → Jinja-subset
SQL models rendered and run topologically — and return the final mart
table. The oracle is the same chain expressed as one DuckDB SQL
statement, so a hash match certifies renderer, DAG runner, write
strategy, and dialect normalization in one shot.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..config import TenantSpec
from ..pipeline import TenantPipeline
from . import register

_STG = """\
{{ config(materialized='table') }}
SELECT * FROM {{ source('raw', 'customer') }}
{% if var('segment', '') %}
WHERE c_mktsegment = '{{ var("segment") }}'
{% endif %}
"""

_MART = """\
{{ config(materialized='table', alias='mart_customer') }}
SELECT CAST(c_custkey AS VARCHAR)                    AS customer_id,
       COALESCE(c_name, 'UNKNOWN')                   AS customer_name,
       c_mktsegment || '_SEG'                        AS segment_tag,
       CAST(c_acctbal * 1.1 AS DOUBLE)               AS uplifted_bal,
       CAST(CURRENT_TIMESTAMP AS VARCHAR)            AS created_at
FROM {{ ref('stg_customer') }}
"""


_MODELS_DIR: str | None = None


def _models_dir() -> str:
    """One models directory per process, reused across invocations —
    mkdtemp per call leaked a /tmp directory every bench/correctness
    run; cleaned up at interpreter exit."""
    global _MODELS_DIR
    if _MODELS_DIR is None:
        _MODELS_DIR = tempfile.mkdtemp(prefix="mozart_models_")
        atexit.register(shutil.rmtree, _MODELS_DIR, ignore_errors=True)
        with open(os.path.join(_MODELS_DIR, "stg_customer.sql"), "w") as f:
            f.write(_STG)
        with open(os.path.join(_MODELS_DIR, "mart_customer.sql"), "w") as f:
            f.write(_MART)
    return _MODELS_DIR


@register(
    "etl_mart_customer",
    tags=("engine", "pipeline", "renderer"),
    doc="Full engine run: parquet source -> raw layer (full replace) -> "
    "staging model (template-time predicate, "
    "stg_cfg_item_master.sql:21-23 semantics) -> mart model (:: casts, "
    "||, COALESCE, frozen CURRENT_TIMESTAMP, "
    "mart_item_master.sql:8-16 semantics), materialized as catalog "
    "tables; returns the mart. Covers O1-O4, S7/S9/S13, P1/P2/P6, "
    "E1/E2/E4/E6/E8, Q1-Q3.",
    oracle="""
        WITH staged AS (
            SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        SELECT CAST(c_custkey AS VARCHAR)          AS customer_id,
               COALESCE(c_name, 'UNKNOWN')         AS customer_name,
               c_mktsegment || '_SEG'              AS segment_tag,
               CAST(c_acctbal * 1.1 AS DOUBLE)     AS uplifted_bal,
               '2024-01-01 00:00:00'               AS created_at
        FROM staged
    """,
)
def etl_mart_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    models = _models_dir()
    spec = TenantSpec.from_dict(
        {
            "tenant_id": "etl_demo",
            "source": {"type": "parquet", "path": sf_dir},
            "params": {"c_mktsegment": "BUILDING", "segment": "BUILDING"},
            "tables": [
                {
                    "name": "customer",
                    "columns": ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
                    "tenant_filter": "c_mktsegment",
                }
            ],
            "models_dir": models,
        }
    )
    pipe = TenantPipeline(spec=spec, frozen_clock="2024-01-01 00:00:00")
    pipe.run(spark)
    return spark.table("etl_demo.mart_customer")
