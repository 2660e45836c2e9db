"""Query bank: named queries with DuckDB oracle SQL.

Each entry pairs an idiomatic-PySpark implementation (DataFrame API,
Catalyst-optimizable) with an ANSI-SQL oracle string that DuckDB can
run against the same parquet tables. The driver harness compares the
two at sf=0.01 (row count + schema + order-insensitive value hash).

Determinism rules every query follows (so hashes are stable):

- every computed column is aliased identically on both sides;
- floating-point aggregates are ``round()``-ed on both sides (raw
  column passthrough is fine — same bits either way);
- timestamps are returned as epoch-microsecond BIGINTs, DATEs, or
  formatted strings — never engine-rendered local timestamps;
- ``LIMIT`` always follows a total order (explicit tie-breakers);
- integer-typed results are cast to BIGINT on both sides (DuckDB
  ``count``/``sum``/``rank`` widths differ from Spark's defaults).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


#: Driver-facing ordering. The driver harness records CORRECTNESS rows
#: for exactly the first 50 entries of ``queries()`` in dict order, so
#: entry order decides which queries get certified each round. Round-8
#: rotation (the order the r7 verdict prescribed): (a) the six queries
#: whose latest driver row dates from r5 — the five streaming drains
#: plus etl_mart_customer, the only registry entries older than r6,
#: explicitly deferred by the r7 rotation as that window's slowest
#: rows; (b) the queries CHANGED this round — dedup_embedding_lsh
#: now registers the collapse_identical=True + max_bucket_size=256
#: staging (pre-certified output-identical on the driver corpus in
#: tests/test_lsh_bucket_cap.py; its rows-only row must stay
#: non-vacuous at >= 20 rows), revenue_rollup/revenue_cube run the
#: ANSI re-aggregation cascade (operators/agg.py; already r6-dated so
#: they sit in slot (c) anyway), and text_rolling_hash/
#: text_repetition_stats carry NULL-faithful oracle SQL (inert on
#: driver data, re-verified hash-green locally at sf0.01); (c) 41 of
#: the 49 queries whose latest row dates from r6. The eight r6-dated
#: queries that don't fit the 50-slot window — dedup_embedding_cosine,
#: dedup_minhash_lsh, cross_nation_trade, knn_lsh_cosine,
#: asof_click_view, knn_ivf_cosine (deferred at rotation time), plus
#: regional_supplier_revenue and order_price_quantiles (demoted late
#: r8 for the two changed-oracle queries; next-slowest r6-green
#: rows) — stay r6-dated and rotate first in r9. Everything else
#: outside the window has a green r7 row. COVERAGE.md carries the
#: per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) driver row last recorded in round 5 (streaming drains +
    # the reference-parity ETL mart pipeline)
    "streaming_hourly_counts",
    "streaming_sessionize",
    "streaming_running_totals",
    "streaming_interval_join",
    "streaming_continuous_aggregate",
    "etl_mart_customer",
    # (b) changed this round — certify the collapse+cap default and
    # the NULL-faithful oracles now
    "dedup_embedding_lsh",
    "text_rolling_hash",
    "text_repetition_stats",
    # (c) driver row last recorded in round 6
    "big_spenders",
    "both_segments_nations",
    "corpus_source_cap",
    "customer_order_distribution",
    "customers_with_orders",
    "customers_without_recent_orders",
    "dedup_exact",
    "dedup_simhash",
    "disjunctive_filter_revenue",
    "distinct_parts_approx",
    "distinct_parts_per_flag",
    "event_props_json",
    "events_hourly_histogram",
    "events_user_sketch_rollup",
    "high_value_only_custkeys",
    "idle_rich_customers",
    "incremental_range_scan",
    "large_order_customers",
    "latest_event_per_user",
    "lineitem_stats",
    "multimodal_features",
    "nation_market_share",
    "nation_revenue_rank",
    "order_price_quantiles_approx",
    "order_priority_waiting",
    "part_name_word_counts",
    "party_nation_counts",
    "pricing_summary",
    "promo_revenue_ratio",
    "range_join_click_views",
    "revenue_cube",
    "revenue_rollup",
    "segment_nation_list",
    "segment_year_pivot",
    "small_quantity_revenue",
    "text_fingerprint",
    "text_quality_score",
    "text_token_stats",
    "top_orders_revenue",
    "top_parts_by_price",
    "top_supplier_revenue",
)


def _ordered_registry() -> dict[str, QuerySpec]:
    _ensure_loaded()
    out: dict[str, QuerySpec] = {}
    for name in DRIVER_PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _ordered_registry().items() if spec.oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: @register calls populate REGISTRY
    from . import relational  # noqa: F401
    from . import relational_adv  # noqa: F401
    from . import llmops  # noqa: F401
    from . import engine  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import corpus  # noqa: F401

    _LOADED = True
