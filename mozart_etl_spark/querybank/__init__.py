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
#: Round-12 rotation (the order the r11 verdict prescribed): (a) the
#: 16 queries whose latest driver row dates from r9 — exactly the set
#: the r11 rotation deferred (pinned then in
#: test_driver_priority_window and COVERAGE.md) — lead the window.
#: (b) the queries CHANGED since the r11 driver run: the r11 advisor
#: fixes (text_cooccurrence_pmi excludes NULL doc ids from the
#: presence sets on both sides; the streaming hourly builder
#: validates event_time_ceiling eagerly — streaming_hourly_counts /
#: streaming_continuous_aggregate share it), and the two r12 axes —
#: the RAGGED-DIMENSION embedding class (wrong-length vectors are
#: entry-excluded wherever a model dim is declared, mirrored as
#: len(v)=64 in the oracles: knn_bruteforce_cosine, knn_ivf_cosine,
#: knn_lsh_cosine, embedding_centroids, dedup_embedding_cosine,
#: dedup_embedding_lsh, and the row-faithful-by-contract
#: embedding_quantize_check) and the GIANT-DOCUMENT bound (the
#: minhash/simhash arrow folds slice their per-row work matrices at
#: _FOLD_SLICE — bit-identical by associativity, pinned — and the
#: multimodal featurizer vectorized its byte loop: dedup_simhash,
#: dedup_minhash_lsh (in slot (a)), dedup_components, dedup_canonical,
#: multimodal_features).
#: The giant-document perf rewrites widen (b) further: the
#: linear-form strip expressions (translate counts /
#: extract-all-join fingerprint — text_quality_score,
#: text_fingerprint, corpus_decontaminate, corpus_incremental_dedup;
#: corpus_clean sits in slot (a)) and the linear-form
#: shingle/span/byte ORACLES (dedup_ngram_jaccard,
#: corpus_repeated_spans, corpus_span_scrub — per-element concat
#: instead of list-slice-in-lambda, which is O(n²) per document in
#: DuckDB), plus the linear piece-form chunkers (corpus_chunks /
#: corpus_chunks_overlap — the chunk array is built BELOW the
#: generator so a giant document's body no longer rides every
#: generated row).
#: (c) the 11 fastest of the r10-dated queries (latest row r10).
#: The 19 r10-dated queries that don't fit — revenue_cube,
#: event_props_json, idle_rich_customers, small_quantity_revenue,
#: distinct_parts_per_flag, text_rolling_hash, top_supplier_revenue,
#: corpus_shard_plan, customer_balance_deciles, text_tfidf_top_terms,
#: text_bigram_cross_entropy, plus the fill demotions
#: pricing_summary, segment_year_pivot, promo_revenue_ratio,
#: corpus_temperature_mix, revenue_rollup,
#: order_price_quantiles_approx, top_parts_by_price,
#: events_user_sketch_rollup (each bumped when a changed query
#: took its slot) — stay r10-dated and rotate first in r13. After
#: this round no registered query's latest row is older than r10.
#: COVERAGE.md carries the per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) driver row last recorded in round 9 — rotate first
    "events_markov_transitions",
    "range_join_click_views",
    "events_funnel",
    "nation_revenue_running_share",
    "corpus_clean",
    "orders_column_profile",
    "part_name_typo_pairs",
    "cross_nation_trade",
    "regional_supplier_revenue",
    "asof_click_view",
    "dedup_minhash_lsh",
    "events_salted_enrich",
    "text_top_bigrams",
    "events_orphan_users",
    "events_intervisit_gaps",
    "corpus_pii_scrub",
    # (b) changed since the r11 driver run — the r11 advisor fixes
    # and the r12 ragged-dimension + giant-document axes must be
    # certified immediately
    "text_cooccurrence_pmi",
    "streaming_hourly_counts",
    "streaming_continuous_aggregate",
    "knn_bruteforce_cosine",
    "knn_ivf_cosine",
    "knn_lsh_cosine",
    "embedding_centroids",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "embedding_quantize_check",
    "dedup_simhash",
    "dedup_components",
    "dedup_canonical",
    "multimodal_features",
    # (b continued) giant-document perf rewrites: linear strip
    # expressions and linear-form DuckDB oracles
    "text_quality_score",
    "text_fingerprint",
    "corpus_decontaminate",
    "corpus_incremental_dedup",
    "dedup_ngram_jaccard",
    "corpus_repeated_spans",
    "corpus_span_scrub",
    "corpus_chunks",
    "corpus_chunks_overlap",
    # (c) driver row last recorded in round 10 (fastest 11)
    "segment_nation_list",
    "incremental_range_scan",
    "part_name_word_counts",
    "dedup_exact",
    "party_nation_counts",
    "events_hourly_histogram",
    "customers_with_orders",
    "customers_without_recent_orders",
    "high_value_only_custkeys",
    "lineitem_stats",
    "text_token_stats",
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
