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
#: entry order decides which queries get certified each round. Round-5
#: rotation: (a) the five queries first registered in round 4, whose
#: only evidence so far is the in-repo oracle suite — they have never
#: had a driver row; (b) the two queries CHANGED this round
#: (corpus_decontaminate's empty-token filter; customer_balance_deciles
#: rides the reworked global_row_number offsets — note
#: corpus_repeated_spans / corpus_span_scrub / corpus_shard_plan in
#: group (a) also carry this round's operator changes, so every
#: changed query is certified immediately); then (c) the 41 remaining
#: oracle-bearing queries whose latest driver row dates from round 3;
#: closing with (d) dedup_ngram_jaccard, changed late in the round
#: (fingerprint-keyed shingle join), and (e) one fresh rows-only check
#: of an approximate operator. After this window every oracle-bearing
#: query has a green row dated r4 or r5; the no_oracle entries outside
#: it (dedup_simhash, distinct_parts_approx, dedup_minhash_lsh,
#: knn_lsh_cosine, knn_ivf_cosine, order_price_quantiles_approx,
#: events_user_sketch_rollup) are pinned by in-repo error-bound tests
#: and have rows-only driver rows from earlier rounds. COVERAGE.md
#: carries the per-query round map.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) registered in round 4 — first-ever driver certification
    "dedup_canonical",
    "corpus_incremental_dedup",
    "corpus_shard_plan",
    "corpus_repeated_spans",
    "corpus_span_scrub",
    # (b) changed this round — certify the fixes now
    "corpus_decontaminate",
    "customer_balance_deciles",
    # (c) oracle-bearing, driver row last recorded in round 3
    "corpus_chunks",
    "corpus_chunks_overlap",
    "corpus_clean",
    "corpus_pack_sequences",
    "corpus_pii_scrub",
    "corpus_sample_balanced",
    "corpus_shuffle_slice",
    "corpus_source_cap",
    "corpus_temperature_mix",
    "corpus_weighted_sample",
    "dedup_components",
    "embedding_centroids",
    "embedding_quantize_check",
    "etl_mart_customer",
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
    "streaming_continuous_aggregate",
    "streaming_hourly_counts",
    "streaming_interval_join",
    "streaming_running_totals",
    "streaming_sessionize",
    "text_bigram_cross_entropy",
    "text_bpe_token_stats",
    "text_cooccurrence_pmi",
    "text_lang_confusion",
    "text_repetition_stats",
    "text_rolling_hash",
    "text_stopword_ratio",
    "text_tfidf_top_terms",
    "text_top_bigrams",
    # (d) changed late in round 5 (fingerprint-keyed shingle join) —
    # certify the scale path's exact output immediately
    "dedup_ngram_jaccard",
    # (e) approximate operator — fresh rows-only check
    "dedup_embedding_lsh",
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
