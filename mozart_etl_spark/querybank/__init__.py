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
#: entry order decides which queries get certified each round. Round-6
#: rotation: (a) the two queries CHANGED this round —
#: dedup_embedding_lsh (scaled-twin injection: its rows-only row must
#: now record spark_rows > 0 instead of the vacuous 0 of r2/r3/r5) and
#: corpus_source_cap (now running the salted two-level cap, certified
#: hash-exactly against the unchanged single-window oracle); (b) the
#: seven rows-only approximate entries whose driver rows date from
#: r1-r4 (dedup_simhash / distinct_parts_approx r1;
#: events_user_sketch_rollup, order_price_quantiles_approx,
#: knn_lsh_cosine, knn_ivf_cosine r2/r3; dedup_minhash_lsh r4); (c) 41
#: of the 48 oracle-bearing queries whose latest row dates from r4.
#: Seven trivial relational queries with four consecutive green rows
#: (r1-r4) — select_project_filter, mart_item_master,
#: string_functions, order_price_buckets, orders_by_year,
#: part_catalog_enriched, events_by_type — don't fit the 50-slot
#: window this round and stay r4-dated; rotate them first in r7.
#: Everything outside the window has a green row dated r5 from last
#: round's rotation. COVERAGE.md carries the per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) changed this round — certify the fixes now
    "dedup_embedding_lsh",
    "corpus_source_cap",
    # (b) rows-only approximate entries, driver rows dated r1-r4
    "dedup_simhash",
    "distinct_parts_approx",
    "events_user_sketch_rollup",
    "order_price_quantiles_approx",
    "knn_lsh_cosine",
    "knn_ivf_cosine",
    "dedup_minhash_lsh",
    # (c) oracle-bearing, driver row last recorded in round 4
    "asof_click_view",
    "range_join_click_views",
    "dedup_embedding_cosine",
    "multimodal_features",
    "dedup_exact",
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "pricing_summary",
    "top_orders_revenue",
    "regional_supplier_revenue",
    "customers_with_orders",
    "customers_without_recent_orders",
    "party_nation_counts",
    "high_value_only_custkeys",
    "both_segments_nations",
    "latest_event_per_user",
    "nation_revenue_rank",
    "top_parts_by_price",
    "distinct_parts_per_flag",
    "big_spenders",
    "order_priority_waiting",
    "revenue_rollup",
    "revenue_cube",
    "segment_year_pivot",
    "incremental_range_scan",
    "events_hourly_histogram",
    "cross_nation_trade",
    "customer_order_distribution",
    "promo_revenue_ratio",
    "small_quantity_revenue",
    "large_order_customers",
    "disjunctive_filter_revenue",
    "idle_rich_customers",
    "nation_market_share",
    "top_supplier_revenue",
    "lineitem_stats",
    "order_price_quantiles",
    "part_name_word_counts",
    "segment_nation_list",
    "event_props_json",
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
