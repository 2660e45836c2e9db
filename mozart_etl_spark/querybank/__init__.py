"""Query bank: named queries with DuckDB oracle SQL.

Each entry pairs an idiomatic-PySpark implementation (DataFrame API,
Catalyst-optimizable) with an ANSI-SQL oracle string that DuckDB can
run against the same parquet tables. The driver harness compares the
two at sf=0.01 (row count + schema + order-insensitive value hash).

Determinism rules every query follows (so hashes are stable):

- every computed column is aliased identically on both sides;
- floating-point aggregates are ``round()``-ed on both sides (raw
  column passthrough is fine — same bits either way). The rounding
  contract is only well-defined for |x| < ~4.5e11: beyond that,
  10^4·x stops being exactly representable, 4dp is sub-ulp, and
  Spark's BigDecimal-exact rounding legitimately differs from
  DuckDB's multiply-rint in the last bit (measured r10: a one-ulp
  mismatch at 4.9e36 on a centroid mean containing a FLT_MAX-scale
  component). Data that large is valid input to the OPERATORS —
  the legal-extreme variant axis pins that at 1e9 — but oracle
  hash-equality assertions must keep rounded aggregates inside the
  exact range;
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
#: entry order decides which queries get certified each round.
#: Round-10 rotation (the order the r9 verdict prescribed): (a) the 13
#: queries whose latest driver row dates from r7 — exactly the set the
#: r9 rotation deferred (the slowest r7-green rows, pinned then in
#: test_driver_priority_window) — lead the window;
#: knn_bruteforce_cosine doubles as a changed query (its oracle gained
#: the ±Inf guard). (b) the queries CHANGED since the r9 driver run:
#: the ±Inf corrupt-vector axis rewrote every embedding scorer's entry
#: guard and its oracles (operators/similarity.py corrupt-vector
#: policy — an Inf component passes any NaN-only component check and
#: first becomes NaN at the cosine division, inheriting the full NaN
#: outranking pathology in both engines), and embedding_quantize_check
#: additionally gained the impl="arrow" fused kernel (r9's one weak:
#: the 6.4x HOF-fold regression); revenue_rollup/revenue_cube carry
#: the cascade grouping-set materialization fix (output-inert,
#: re-certified anyway) and corpus_temperature_mix the explicit
#: broadcast hint on the NULL-safe join-back (plan-only, ditto);
#: dedup_components/dedup_canonical carry the total-coverage contract
#: lift but sit in slot (a) already. (c) the 28 fastest of the
#: remaining 41 r8-dated queries. The 13 r8-dated queries that don't
#: fit the window — dedup_simhash, corpus_source_cap,
#: customer_order_distribution, order_priority_waiting,
#: nation_revenue_rank, distinct_parts_approx, top_orders_revenue,
#: disjunctive_filter_revenue, big_spenders, nation_market_share,
#: both_segments_nations, etl_mart_customer, streaming_running_totals
#: — stay r8-dated and rotate first in r11. Everything else outside
#: the window has a green r9 row. COVERAGE.md carries the per-query
#: round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) driver row last recorded in round 7 — rotate first
    "knn_bruteforce_cosine",
    "corpus_incremental_dedup",
    "text_tfidf_top_terms",
    "text_bigram_cross_entropy",
    "dedup_ngram_jaccard",
    "text_cooccurrence_pmi",
    "corpus_repeated_spans",
    "corpus_decontaminate",
    "corpus_shard_plan",
    "customer_balance_deciles",
    "corpus_span_scrub",
    "dedup_components",
    "dedup_canonical",
    # (b) changed since the r9 driver run — the ±Inf corrupt-vector
    # axis (scorers + oracles), the quantize arrow kernel, and the
    # two output-inert hardenings must be certified immediately
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "knn_lsh_cosine",
    "knn_ivf_cosine",
    "embedding_centroids",
    "embedding_quantize_check",
    "revenue_rollup",
    "revenue_cube",
    "corpus_temperature_mix",
    # (c) driver row last recorded in round 8 (fastest 28)
    "top_parts_by_price",
    "text_fingerprint",
    "text_token_stats",
    "text_rolling_hash",
    "incremental_range_scan",
    "segment_nation_list",
    "dedup_exact",
    "order_price_quantiles_approx",
    "event_props_json",
    "lineitem_stats",
    "text_quality_score",
    "part_name_word_counts",
    "distinct_parts_per_flag",
    "small_quantity_revenue",
    "events_hourly_histogram",
    "events_user_sketch_rollup",
    "high_value_only_custkeys",
    "customers_with_orders",
    "customers_without_recent_orders",
    "pricing_summary",
    "top_supplier_revenue",
    "party_nation_counts",
    "text_repetition_stats",
    "large_order_customers",
    "idle_rich_customers",
    "multimodal_features",
    "promo_revenue_ratio",
    "segment_year_pivot",
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
