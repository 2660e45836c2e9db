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


#: Driver-facing ordering. The driver harness records CORRECTNESS
#: rows for exactly the first 50 entries of ``queries()`` in dict
#: order, so entry order decides which queries get certified each
#: round.
#: Round-15 rotation (executing the r14 rotation's committed plan —
#: "the 11 r12-dated rows rotate first in r15" — plus the usual
#: changed-queries-lead rule): (a) the 16 queries whose plans or
#: operators changed in the r15 optimization round lead, so the
#: driver hash-certifies every touched query this round (five of
#: them are also r12-dated); (b) the remaining 6 r12-dated rows from
#: the r14 deferral list; (c) the 28 fastest r13-dated rows fill the
#: window. The 13 slowest r13-dated rows that don't fit —
#: event_props_json, events_sessionize, revenue_cube, big_spenders,
#: distinct_parts_per_flag, lineitem_stats, dedup_simhash,
#: small_quantity_revenue, top_orders_revenue, order_price_quantiles,
#: text_tfidf_top_terms, corpus_shard_plan, text_bigram_cross_entropy
#: — stay one-round-stale (r13-dated; none changed this round) and
#: rotate first next round. After this round no registered query's
#: latest row is older than r13. COVERAGE.md carries the per-query
#: round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the 16 queries whose plans/operators changed in the r15
    # optimization round — certify first (cc observe probe, no-data
    # batch skip, stateful projection, _gram_sql shingles, PMI
    # checkpoints, cosine fold pins, return_total, band-expr parse)
    "dedup_components",
    "dedup_canonical",
    "streaming_interval_join",
    "streaming_continuous_aggregate",
    "streaming_running_totals",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "corpus_span_scrub",
    "corpus_repeated_spans",
    "text_cooccurrence_pmi",
    "knn_lsh_cosine",
    "knn_ivf_cosine",
    "knn_bruteforce_cosine",
    "dedup_embedding_lsh",
    "dedup_embedding_cosine",
    "customer_balance_deciles",
    # (b) the 6 remaining r12-dated rows (the r14 rotation's
    # explicit r15 deferrals not already in (a))
    "asof_click_view",
    "corpus_chunks",
    "corpus_decontaminate",
    "corpus_incremental_dedup",
    "corpus_pii_scrub",
    "cross_nation_trade",
    # (c) the 28 fastest r13-dated rows fill the window; the 13
    # slowest r13-dated rows stay one-round-stale and rotate first
    # next round (window driver runtime stays bounded)
    "select_project_filter",
    "string_functions",
    "top_parts_by_price",
    "part_catalog_enriched",
    "corpus_sample_balanced",
    "corpus_shuffle_slice",
    "mart_item_master",
    "text_rolling_hash",
    "orders_by_year",
    "corpus_weighted_sample",
    "text_stopword_ratio",
    "order_price_buckets",
    "text_lang_confusion",
    "text_bpe_token_stats",
    "events_key_skew_profile",
    "events_by_type",
    "latest_event_per_user",
    "top_supplier_revenue",
    "promo_revenue_ratio",
    "pricing_summary",
    "text_repetition_stats",
    "idle_rich_customers",
    "segment_year_pivot",
    "order_priority_waiting",
    "events_retention_cohorts",
    "revenue_rollup",
    "multimodal_manifest",
    "corpus_temperature_mix",
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
