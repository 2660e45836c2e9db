"""Plan-shape regression guards over the whole query bank.

Every registered (non-streaming, non-iterative) query's physical plan
is asserted free of the two patterns that hard-fail at 100 TB:

- ``CartesianProduct`` — a non-broadcast cross product scales as
  |L|x|R|. (BroadcastNestedLoopJoin of a 1-row/centroid-sized frame is
  the intended pattern for scalar joins and stays allowed.)
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the data path.
  Arrow-batched Python (``ArrowEvalPython`` / ``mapInPandas``
  / ``FlatMapGroupsInPandas``) remains allowed: that is the documented
  escape hatch.

Streaming queries execute on build (drain) and iterative queries run
jobs while planning, so they are guarded by their own tests instead.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from mozart_etl_spark.querybank import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.001"

GUARDED = sorted(
    name
    for name, spec in REGISTRY.items()
    if "streaming" not in spec.tags and "iterative" not in spec.tags
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", GUARDED)
def test_no_scale_killers_in_plan(spark, name):
    plan = _plan(REGISTRY[name].fn(spark, SF))
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_salted_join_spreads_hot_key(spark):
    """Measured skew mitigation, not asserted-by-docstring: a fact
    table where one key holds 90% of rows joins a small dim. The
    shuffle straggler is decided by rows-per-reduce-key; salting must
    cut the hot key's largest reduce group by ~n_salts while keeping
    the join's results identical to the plain join."""
    from pyspark.sql import functions as F

    from mozart_etl_spark.operators.corpus import salted_join

    n, n_salts = 100_000, 8
    # 90% of rows land on key 1, the rest spread over keys 2..50
    fact = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(2 + F.pmod(F.col("id"), F.lit(49)))
        .alias("k"),
    )
    dim = spark.range(1, 51).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )

    plain_max = (
        fact.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    assert plain_max >= 0.89 * n  # the stress input really is skewed

    salted = salted_join(fact, dim, "k", "dk", fact_row_id="row_id", n_salts=n_salts)

    # reduce-key balance: re-derive the (key, salt) group sizes the
    # shuffle hashes on; the hot key's biggest bucket must shrink ~8x
    # and its buckets must be even (hash salting, not round-robin luck)
    buckets = (
        fact.withColumn("_salt", F.pmod(F.hash(F.col("row_id")), F.lit(n_salts)))
        .groupBy("k", "_salt")
        .count()
    )
    hot = [r["count"] for r in buckets.filter(F.col("k") == 1).collect()]
    assert len(hot) == n_salts
    assert max(hot) <= 2.0 * plain_max / n_salts, f"hot-key buckets skewed: {hot}"
    assert max(hot) <= 1.2 * (sum(hot) / len(hot)), f"uneven salting: {hot}"

    # and the salted join is the plain join, exactly
    expected = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert salted.count() == n
    assert expected.count() == n
    assert (
        salted.select("row_id", "k", "label")
        .exceptAll(expected.select("row_id", "k", "label"))
        .count()
        == 0
    )


def test_certified_jaccard_edge_chain_plan_shape(spark):
    """dedup_components / dedup_canonical are tagged iterative (the
    component loop runs jobs while planning), so the bank-wide
    scale-killer guard skips them — but their r7-certified EDGE
    GENERATOR (MinHash-LSH candidates -> jaccard_verify_pairs ->
    exact threshold, querybank.llmops._jaccard_edges) is a plain
    join DAG and gets its own guard: no non-broadcast cross product
    and no row-at-a-time Python anywhere in the static plan (every
    join is an equi-join — hash-partitionable at scale; whether AQE
    picks broadcast or shuffle-hash per join is runtime's call and
    deliberately not pinned). The MinHash signature stage itself sits
    behind a lazy localCheckpoint (its Arrow-vs-row-Python property is
    pinned by the minhash impl-equivalence tests), so this guard
    asserts the POST-checkpoint DAG: band self-join + verify joins +
    size joins."""
    from mozart_etl_spark.io import table
    from mozart_etl_spark.querybank.llmops import _jaccard_edges

    docs = table(spark, SF, "documents")
    plan = _plan(_jaccard_edges(docs))
    assert "CartesianProduct" not in plan, "non-broadcast cross product"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF"
    # stage-0 exact collapse (late r7): the star-edge union must be in
    # the registered plan — without it a giant verbatim-duplicate
    # cluster re-enters the band join and enumerates quadratically
    # many bucket pairs. (The collapse WINDOW itself sits behind the
    # signature localCheckpoint, invisible to this post-checkpoint
    # plan; its behavior is pinned functionally by
    # test_jaccard_edges_exact_cluster_is_linear_and_components_exact.)
    assert "Union" in plan, "star-edge union missing from certified chain"
