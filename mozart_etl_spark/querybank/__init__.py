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
#: entry order decides which queries get certified each round. Round-4
#: rotation: (a) the two queries CHANGED this round (the repaired
#: multimodal_features projection and the re-bounded
#: dedup_embedding_cosine) so the fixes are certified immediately,
#: then (b) the 47 oracle-bearing queries whose only driver row dates
#: from round 1 (they have survived three rounds of engine changes on
#: pytest evidence alone), then (c) the flagship approximate dedup
#: entry for a fresh rows-only check. With this window every
#: oracle-bearing query has a green row dated r3 or r4; the two
#: remaining no_oracle entries outside it (dedup_simhash,
#: distinct_parts_approx) are pinned by in-repo error-bound tests.
#: COVERAGE.md carries the per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) changed this round — certify the fixes now
    "multimodal_features",
    "dedup_embedding_cosine",
    # (b) oracle-bearing, driver row last recorded in round 1
    "pricing_summary",
    "select_project_filter",
    "incremental_range_scan",
    "top_orders_revenue",
    "customers_with_orders",
    "customers_without_recent_orders",
    "cross_nation_trade",
    "mart_item_master",
    "orders_by_year",
    "part_catalog_enriched",
    "string_functions",
    "order_price_buckets",
    "revenue_rollup",
    "revenue_cube",
    "segment_year_pivot",
    "latest_event_per_user",
    "nation_revenue_rank",
    "top_parts_by_price",
    "party_nation_counts",
    "both_segments_nations",
    "high_value_only_custkeys",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_token_stats",
    "text_quality_score",
    "text_fingerprint",
    "asof_click_view",
    "range_join_click_views",
    "big_spenders",
    "customer_order_distribution",
    "disjunctive_filter_revenue",
    "distinct_parts_per_flag",
    "event_props_json",
    "events_by_type",
    "events_hourly_histogram",
    "idle_rich_customers",
    "large_order_customers",
    "lineitem_stats",
    "nation_market_share",
    "order_price_quantiles",
    "order_priority_waiting",
    "part_name_word_counts",
    "promo_revenue_ratio",
    "regional_supplier_revenue",
    "segment_nation_list",
    "small_quantity_revenue",
    "top_supplier_revenue",
    # (c) flagship approximate dedup — fresh rows-only check
    "dedup_minhash_lsh",
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
