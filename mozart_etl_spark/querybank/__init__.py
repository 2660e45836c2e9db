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
#: Round-13 rotation (the order the r12 verdict prescribed): (a) the
#: 19 queries whose latest driver row dates from r10 — exactly the
#: set the r12 rotation deferred (pinned then in
#: test_driver_priority_window and COVERAGE.md) — lead the window.
#: (b) the queries CHANGED since the r12 driver run: the five
#: formerly-rows-only approximate operators now carrying FULL value
#: oracles (dedup_minhash_lsh / dedup_simhash re-registered with the
#: portable 60-bit md5 hash so the whole integer chain is
#: bit-checkable; knn_lsh_cosine / dedup_embedding_lsh with the
#: seeded hyperplanes injected as SQL literals; knn_ivf_cosine as a
#: plain SQL twin — r12 verdict item #1), the r12 advisor fix
#: (text_cooccurrence_pmi oracle cap ordering made total), and the
#: r13 float-key axis changes (order_price_quantiles NaN-exclusion
#: contract on both sides; streaming_running_totals' stateful kernel
#: made SQL-SUM-faithful on NaN / all-NULL keys via the value
#: null-split). dedup_minhash_lsh and order_price_quantiles_approx
#: sit in slot (a) already; dedup_embedding_lsh additionally changed
#: code (row-unique collapse representative pick).
#: Also in (b): lineitem_stats — the float-key edge sweep found corr's
#: internal stddev RAISES in DuckDB under an NaN measure where Spark
#: yields NaN, so every second-moment input now carries the
#: NaN-exclusion guard on both sides.
#: (c) the 22 fastest r11-dated queries fill the window.
#: The 12 r11-dated queries that don't fit — nation_revenue_rank,
#: large_order_customers,
#: corpus_pack_sequences, disjunctive_filter_revenue,
#: nation_market_share, distinct_parts_approx, corpus_source_cap,
#: customer_order_distribution, streaming_sessionize,
#: etl_mart_customer, streaming_interval_join, both_segments_nations
#: — stay r11-dated and rotate first in r14. After this round no
#: registered query's latest row is older than r11.
#: COVERAGE.md carries the per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) driver row last recorded in round 10 — rotate first
    "revenue_cube",
    "event_props_json",
    "idle_rich_customers",
    "small_quantity_revenue",
    "distinct_parts_per_flag",
    "text_rolling_hash",
    "top_supplier_revenue",
    "corpus_shard_plan",
    "customer_balance_deciles",
    "text_tfidf_top_terms",
    "text_bigram_cross_entropy",
    "pricing_summary",
    "segment_year_pivot",
    "promo_revenue_ratio",
    "corpus_temperature_mix",
    "revenue_rollup",
    "order_price_quantiles_approx",
    "top_parts_by_price",
    "events_user_sketch_rollup",
    # (b) changed since the r12 driver run — the newly-oracled
    # approximate set, the r12 advisor fix, and the r13 float-key
    # axis must be certified immediately
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_lsh_cosine",
    "knn_ivf_cosine",
    "dedup_embedding_lsh",
    "text_cooccurrence_pmi",
    "order_price_quantiles",
    "streaming_running_totals",
    "lineitem_stats",
    # (c) driver row last recorded in round 11 (fastest 22)
    "text_bpe_token_stats",
    "string_functions",
    "select_project_filter",
    "mart_item_master",
    "text_stopword_ratio",
    "part_catalog_enriched",
    "order_price_buckets",
    "text_lang_confusion",
    "multimodal_manifest",
    "events_by_type",
    "orders_by_year",
    "corpus_sample_balanced",
    "corpus_shuffle_slice",
    "corpus_weighted_sample",
    "big_spenders",
    "latest_event_per_user",
    "events_sessionize",
    "text_repetition_stats",
    "order_priority_waiting",
    "events_key_skew_profile",
    "events_retention_cohorts",
    "top_orders_revenue",
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
