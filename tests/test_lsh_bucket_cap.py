"""Behavioral pins for the deterministic hot-bucket cap in the
MinHash-LSH band join (``signature_band_pairs(max_bucket_size=...)``).

The cap is the safety valve for the one residual quadratic term the
certified dedup chain documents (COVERAGE.md): clusters of NEAR-
duplicate texts share every band's bucket, and within-bucket pair
enumeration is quadratic in bucket size. These tests pin the three
contracts that make the cap safe to reach for in production:

1. off (None) means OFF — bit-identical result to an effectively
   unbounded cap, and no Window node in the physical plan (the
   default path pays zero overhead for the feature's existence);
2. a cap smaller than a hot cluster removes exactly that cluster's
   pairs while pairs from small buckets survive untouched;
3. nonsensical caps (< 2: a bucket of 2 is one pair) are rejected
   loudly, not silently.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from hypothesis import given, settings, strategies as st

from mozart_etl_spark.operators import dedup as D


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

# 8-member hot cluster (identical text => identical signatures => every
# band bucket has 8 members) + a 2-member cold pair + 2 singletons.
_CORPUS = (
    [(i, "alpha beta gamma delta epsilon zeta") for i in range(8)]
    + [(100, "omega psi chi phi upsilon tau"), (101, "omega psi chi phi upsilon tau")]
    + [(200, "one two three four five six"), (201, "moon star cloud rain snow wind")]
)


def _pairs(spark, max_bucket_size):
    df = spark.createDataFrame(_CORPUS, "doc_id INT, text STRING")
    out = D.minhash_lsh_pairs(
        df, n=3, num_perm=8, bands=4, max_bucket_size=max_bucket_size
    )
    return sorted((r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in out.collect())


def test_cap_off_identical_to_unbounded_and_window_free(spark):
    assert _pairs(spark, None) == _pairs(spark, 10**6)
    df = spark.createDataFrame(_CORPUS, "doc_id INT, text STRING")
    assert "Window" not in _plan(D.minhash_lsh_pairs(df, n=3, num_perm=8, bands=4))
    assert "Window" in _plan(
        D.minhash_lsh_pairs(df, n=3, num_perm=8, bands=4, max_bucket_size=5)
    )


def test_cap_drops_hot_cluster_keeps_cold_buckets(spark):
    uncapped = _pairs(spark, None)
    cluster = {(a, b) for a, b, _ in uncapped if a < 8 and b < 8}
    assert len(cluster) == 28  # the quadratic term: C(8,2) verbatim pairs
    assert (100, 101, 1.0) in [(a, b, j) for a, b, j in uncapped]

    capped = _pairs(spark, 4)
    assert {(a, b) for a, b, _ in capped if a < 8 and b < 8} == set()
    assert capped == [t for t in uncapped if not (t[0] < 8 and t[1] < 8)]


def test_cap_below_two_rejected(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id INT, text STRING")
    with pytest.raises(ValueError, match="max_bucket_size"):
        D.minhash_lsh_pairs(df, n=3, num_perm=8, bands=4, max_bucket_size=1)


# --- embedding twin: lsh_near_dup_pairs(max_bucket_size=...) ---

_DIM = 8


def _emb_corpus(spark):
    # 6 identical vectors (one doc embedded 6 times: every table's
    # bucket holds all 6) + one isolated near-identical pair + one
    # orthogonal singleton.
    hot = [1.0, 0.2, -0.3, 0.5, 0.0, 0.7, -0.1, 0.4]
    cold = [-0.6, 0.9, 0.1, -0.8, 0.3, -0.2, 0.5, 0.0]
    lone = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
    rows = [(i, hot) for i in range(6)] + [
        (100, cold),
        (101, [x * 1.001 for x in cold]),
        (200, lone),
    ]
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def _emb_pairs(spark, max_bucket_size):
    from mozart_etl_spark.operators import similarity as S

    out = S.lsh_near_dup_pairs(
        _emb_corpus(spark), _DIM, threshold=0.95, n_planes=4, n_tables=4,
        max_bucket_size=max_bucket_size,
    )
    return sorted((r["doc_a"], r["doc_b"], r["cosine"]) for r in out.collect())


def test_embedding_cap_off_identical_and_window_filter_free(spark):
    from mozart_etl_spark.operators import similarity as S

    assert _emb_pairs(spark, None) == _emb_pairs(spark, 10**6)
    df = _emb_corpus(spark)
    plan_off = _plan(S.lsh_near_dup_pairs(df, _DIM, n_planes=4, n_tables=4))
    plan_on = _plan(
        S.lsh_near_dup_pairs(df, _DIM, n_planes=4, n_tables=4, max_bucket_size=4)
    )
    # lsh_near_dup_pairs has no Window of its own, so node presence is
    # a faithful off-means-off pin here too
    assert "Window" not in plan_off
    assert "Window" in plan_on


def test_embedding_cap_drops_identical_vector_cluster(spark):
    uncapped = _emb_pairs(spark, None)
    assert {(a, b) for a, b, _ in uncapped if a < 6 and b < 6} == {
        (a, b) for a in range(6) for b in range(a + 1, 6)
    }  # C(6,2) = 15 identical-vector pairs at cosine 1.0
    assert any(a == 100 and b == 101 for a, b, _ in uncapped)

    capped = _emb_pairs(spark, 4)
    assert {(a, b) for a, b, _ in capped if a < 6 and b < 6} == set()
    assert capped == [t for t in uncapped if not (t[0] < 6 and t[1] < 6)]


def test_embedding_cap_below_two_rejected(spark):
    from mozart_etl_spark.operators import similarity as S

    with pytest.raises(ValueError, match="max_bucket_size"):
        S.lsh_near_dup_pairs(_emb_corpus(spark), _DIM, max_bucket_size=1)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.text(alphabet="ab x", min_size=0, max_size=40), min_size=2, max_size=10),
    st.integers(min_value=2, max_value=4),
)
def test_cap_is_monotone_in_the_cap(spark, texts, cap):
    """Property: bucket sizes don't depend on the cap, so raising the
    cap only ever ADDS buckets (and therefore pairs) — for any corpus,
    pairs(cap) ⊆ pairs(cap + 1) ⊆ pairs(None)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )

    def pairs(mbs):
        out = D.minhash_lsh_pairs(df, n=2, num_perm=8, bands=4, max_bucket_size=mbs)
        return {(r["doc_a"], r["doc_b"]) for r in out.collect()}

    tight, loose, unbounded = pairs(cap), pairs(cap + 1), pairs(None)
    assert tight <= loose <= unbounded
