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
  exact range. A second instance at ANY magnitude (measured r11):
  a value whose decimal expansion lands EXACTLY on the round-half
  boundary — e.g. a quartile interpolation of cent prices hitting
  x.945, stored as the bit-identical double just below — splits the
  engines the same way (BigDecimal sees < half and rounds down;
  multiply-then-round lands on half and rounds away). The rule:
  round at a precision where the true value is exact (interpolated
  percentiles of d-decimal data at quarter/tenth fractions carry at
  most d+2 decimals — round(., 4) for cent prices), never at a
  coarser one that can create a half-point;
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
#: Round-11 rotation (the order the r10 verdict prescribed): (a) the
#: 13 queries whose latest driver row dates from r8 — exactly the set
#: the r10 rotation deferred (the slowest remaining r8-green rows,
#: pinned then in test_driver_priority_window) — lead the window.
#: (b) the queries CHANGED since the r10 driver run: the r10 advisor
#: pass closed the accumulation-overflow and scale-underflow guard
#: gaps (quantize scale-underflow as a NULL-marked class + oracle
#: quotient form — embedding_quantize_check; norm-form entry guards
#: on both scoring sides of ivf/lsh knn — knn_ivf_cosine /
#: knn_lsh_cosine; the dedup_embedding_cosine oracle's entry guard
#: switched to the same norm form; connected_components nodes= became
#: total-coverage from BOTH sides — dedup_components /
#: dedup_canonical), and the r11 duplicate-dimension-key axis turned
#: six sweep divergences into explicit contracts (fact-keyed
#: aggregates never double under dim fan-out — large_order_customers;
#: per-row maps are row-faithful — text_repetition_stats /
#: multimodal_features; identity-keyed operators collapse duplicate
#: ids — text_cooccurrence_pmi, dedup_canonical, corpus_span_scrub;
#: order_price_quantiles rounds at 4dp on both sides — the
#: duplicate-key sweep landed a quartile interpolation EXACTLY on a
#: half-cent, where Spark BigDecimal and DuckDB multiply-round
#: legitimately disagree at 2dp; the extreme-timestamp axis gave the
#: windowed streaming operators an explicit pre-epoch event-time
#: floor — streaming_sessionize / streaming_hourly_counts /
#: streaming_continuous_aggregate and the batch twin
#: events_sessionize, one implementation — and made the stateful
#: kernel's timestamp path 2^53-safe, certified via
#: streaming_running_totals in slot (a); streaming_interval_join
#: carries the same pre-epoch floor on both join sides — the sf0.01
#: extreme-ts sweep caught its join-state eviction dropping a
#: 1902-dated pair the batch range join kept).
#: (c) the 20 fastest of the remaining r9-dated queries. The 16
#: r9-dated queries that don't fit the window —
#: events_markov_transitions, range_join_click_views, events_funnel,
#: nation_revenue_running_share, corpus_clean, orders_column_profile,
#: part_name_typo_pairs, cross_nation_trade,
#: regional_supplier_revenue, asof_click_view, dedup_minhash_lsh,
#: and the fill demotions events_salted_enrich, text_top_bigrams,
#: events_orphan_users, events_intervisit_gaps, corpus_pii_scrub
#: (each bumped when a changed query took its slot) — stay r9-dated
#: and rotate first in r12. Everything else outside the window has a
#: green r10 row. COVERAGE.md carries the per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) driver row last recorded in round 8 — rotate first
    "dedup_simhash",
    "corpus_source_cap",
    "customer_order_distribution",
    "order_priority_waiting",
    "nation_revenue_rank",
    "distinct_parts_approx",
    "top_orders_revenue",
    "disjunctive_filter_revenue",
    "big_spenders",
    "nation_market_share",
    "both_segments_nations",
    "etl_mart_customer",
    "streaming_running_totals",
    # (b) changed since the r10 driver run — the r10 advisor guard
    # gaps and the r11 duplicate-dimension-key contracts must be
    # certified immediately
    "embedding_quantize_check",
    "knn_ivf_cosine",
    "knn_lsh_cosine",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_canonical",
    "large_order_customers",
    "text_cooccurrence_pmi",
    "text_repetition_stats",
    "multimodal_features",
    "corpus_span_scrub",
    "order_price_quantiles",
    # (b continued) r11 extreme-timestamp axis: the pre-epoch
    # event-time floor in the windowed streaming builders (shared by
    # the batch sessionize twin — one implementation) and the
    # 2^53-safe int64 timestamp path in the stateful kernel
    "streaming_sessionize",
    "streaming_hourly_counts",
    "streaming_continuous_aggregate",
    "events_sessionize",
    "streaming_interval_join",
    # (c) driver row last recorded in round 9 (fastest 20)
    "string_functions",
    "select_project_filter",
    "multimodal_manifest",
    "part_catalog_enriched",
    "mart_item_master",
    "corpus_shuffle_slice",
    "orders_by_year",
    "corpus_weighted_sample",
    "corpus_sample_balanced",
    "text_bpe_token_stats",
    "events_by_type",
    "order_price_buckets",
    "text_lang_confusion",
    "events_key_skew_profile",
    "corpus_chunks",
    "corpus_pack_sequences",
    "latest_event_per_user",
    "corpus_chunks_overlap",
    "events_retention_cohorts",
    "text_stopword_ratio",
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
