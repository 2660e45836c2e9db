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
#: entry order decides which queries get certified each round. Round-7
#: rotation (the order the r6 verdict prescribed): (a) the seven
#: trivial relational queries whose latest driver row dates from r4
#: (four consecutive green rows r1-r4, deferred by the r6 rotation);
#: (b) the three queries CHANGED this round — dedup_embedding_lsh (now
#: runs the scale-safe n_planes="auto" banding; its rows-only row must
#: stay non-vacuous at >= 20 rows) and dedup_components /
#: dedup_canonical (edge chain re-based on the certified at-scale
#: MinHash-LSH -> jaccard_verify_pairs pipeline; their EXACT
#: recursive-CTE oracles are unchanged, so a green row proves the LSH
#: edge set loses nothing on this corpus); (c) 40 of the 46 remaining
#: queries whose latest row dates from r5. The six r5-dated queries
#: that don't fit the 50-slot window — the five streaming drains
#: (streaming_hourly_counts, streaming_sessionize,
#: streaming_running_totals, streaming_interval_join,
#: streaming_continuous_aggregate) and etl_mart_customer, chosen
#: because they are the window's slowest rows and were all r5-green —
#: stay r5-dated and rotate first in r8. Everything else outside the
#: window has a green r6 row. COVERAGE.md carries the per-query round
#: map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) trivial relational queries, driver rows dated r4
    "select_project_filter",
    "mart_item_master",
    "string_functions",
    "order_price_buckets",
    "orders_by_year",
    "part_catalog_enriched",
    "events_by_type",
    # (b) changed this round — certify the scale-safe defaults now
    "dedup_embedding_lsh",
    "dedup_components",
    "dedup_canonical",
    # (c) driver row last recorded in round 5
    "dedup_ngram_jaccard",
    "corpus_chunks",
    "corpus_chunks_overlap",
    "corpus_clean",
    "corpus_decontaminate",
    "corpus_incremental_dedup",
    "corpus_pack_sequences",
    "corpus_pii_scrub",
    "corpus_repeated_spans",
    "corpus_sample_balanced",
    "corpus_shard_plan",
    "corpus_shuffle_slice",
    "corpus_span_scrub",
    "corpus_temperature_mix",
    "corpus_weighted_sample",
    "customer_balance_deciles",
    "embedding_centroids",
    "embedding_quantize_check",
    "events_funnel",
    "events_intervisit_gaps",
    "events_key_skew_profile",
    "events_markov_transitions",
    "events_orphan_users",
    "events_retention_cohorts",
    "events_salted_enrich",
    "events_sessionize",
    "knn_bruteforce_cosine",
    "multimodal_manifest",
    "nation_revenue_running_share",
    "orders_column_profile",
    "part_name_typo_pairs",
    "text_bigram_cross_entropy",
    "text_bpe_token_stats",
    "text_cooccurrence_pmi",
    "text_lang_confusion",
    "text_repetition_stats",
    "text_rolling_hash",
    "text_stopword_ratio",
    "text_tfidf_top_terms",
    "text_top_bigrams",
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
