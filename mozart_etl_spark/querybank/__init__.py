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
#: entry order decides which queries get certified each round. Round-9
#: rotation (the order the r8 verdict prescribed): (a) the eight
#: queries whose latest driver row dates from r6 — the six deferred at
#: the r8 rotation (slowest r6-green rows) plus the two demoted late
#: r8 for the changed-oracle queries; (b) the queries CHANGED this
#: round by the NULL event-timestamp axis — every time-ordered event
#: operator now EXCLUDES NULL-ts events explicitly in both engines
#: (streaming/events.py NULL-timestamp policy; Spark orders NULLS
#: FIRST ascending, DuckDB NULLS LAST, and Spark's time/session
#: windows implicitly drop NULL event-time rows SQL keeps), plus
#: latest_event_per_user (explicit NULLS LAST both sides) and
#: revenue_rollup/revenue_cube (cascade input-validation +
#: sum-type-stability hardening, operators/agg.py — output-inert on
#: double measures, re-certified anyway); asof_click_view is both
#: r6-dated and NULL-ts-changed, so it sits in slot (a);
#: streaming_running_totals and events_hourly_histogram made
#: KEEP-NULL-ts decisions that change no code path (doc-only) and
#: stay r8-dated; (c) the 29 fastest of the 42 remaining r7-dated
#: queries. The 13 r7-dated queries that don't fit the window —
#: knn_bruteforce_cosine, corpus_incremental_dedup,
#: text_tfidf_top_terms, text_bigram_cross_entropy,
#: dedup_ngram_jaccard, text_cooccurrence_pmi, corpus_repeated_spans,
#: corpus_decontaminate, corpus_shard_plan, customer_balance_deciles,
#: corpus_span_scrub, dedup_components, dedup_canonical (the slowest
#: r7-green rows, keeping the certification window's driver runtime
#: bounded) — stay r7-dated and rotate first in r10. Everything else
#: outside the window has a green r8 row. COVERAGE.md carries the
#: per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) driver row last recorded in round 6 — rotate first
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "cross_nation_trade",
    "knn_lsh_cosine",
    "asof_click_view",
    "knn_ivf_cosine",
    "regional_supplier_revenue",
    "order_price_quantiles",
    # (b) changed this round — the NULL-ts axis queries (r8-dated
    # first, then r7-dated) and the cascade-hardened rollup/cube
    "streaming_hourly_counts",
    "streaming_sessionize",
    "streaming_continuous_aggregate",
    "streaming_interval_join",
    "range_join_click_views",
    "latest_event_per_user",
    "revenue_rollup",
    "revenue_cube",
    "events_funnel",
    "events_intervisit_gaps",
    "events_markov_transitions",
    "events_retention_cohorts",
    "events_sessionize",
    # (c) driver row last recorded in round 7 (fastest 29)
    "select_project_filter",
    "part_catalog_enriched",
    "multimodal_manifest",
    "mart_item_master",
    "text_bpe_token_stats",
    "order_price_buckets",
    "string_functions",
    "orders_by_year",
    "corpus_shuffle_slice",
    "corpus_sample_balanced",
    "events_by_type",
    "text_stopword_ratio",
    "embedding_centroids",
    "corpus_weighted_sample",
    "corpus_pii_scrub",
    "embedding_quantize_check",
    "text_top_bigrams",
    "events_key_skew_profile",
    "text_lang_confusion",
    "corpus_chunks_overlap",
    "corpus_pack_sequences",
    "corpus_chunks",
    "events_salted_enrich",
    "part_name_typo_pairs",
    "events_orphan_users",
    "nation_revenue_running_share",
    "orders_column_profile",
    "corpus_temperature_mix",
    "corpus_clean",
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
