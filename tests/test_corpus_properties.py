"""Property-based tests (hypothesis) for the corpus operators.

Pure-function properties run at full example counts; Spark-backed
properties run a reduced count (one Spark job per example) against an
independent pure-Python model of the semantics.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mozart_etl_spark.operators import corpus as C

# ---------------------------------------------------------------------------
# pure functions: exhaustive
# ---------------------------------------------------------------------------


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_threshold_hex_monotone(f1, f2):
    """Larger fraction => lexicographically larger (or equal) cut, so
    nested samples are subsets; cuts are 8-char hex or the 'g'
    keep-all sentinel which sorts after every hex string."""
    lo, hi = sorted((f1, f2))
    c_lo, c_hi = C.fraction_threshold_hex(lo), C.fraction_threshold_hex(hi)
    assert c_lo <= c_hi
    for c in (c_lo, c_hi):
        assert c == "g" or (len(c) == 8 and all(ch in "0123456789abcdef" for ch in c))


@given(st.floats(min_value=0.0, max_value=0.999999, allow_nan=False))
def test_threshold_hex_sorts_below_sentinel(f):
    assert C.fraction_threshold_hex(f) < "g"


# ---------------------------------------------------------------------------
# Spark-backed: reduced example counts, checked against a Python model
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=40), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=7))
def test_chunks_match_python_model(spark, texts, size):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["chunk_len"])
        for r in C.chunk_documents(df, size=size).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for j in range(0, (len(t) + size - 1) // size):
            piece = t[j * size : (j + 1) * size]
            want[(i, j)] = (piece, len(piece))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.integers(min_value=0, max_value=900)),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=1000),
)
def test_pack_matches_python_model(spark, rows, budget):
    df = spark.createDataFrame(
        [(i, lang, tok) for i, (lang, tok) in enumerate(rows)],
        "doc_id INT, lang STRING, n_tokens INT",
    )
    got = {
        r["doc_id"]: r["seq_id"]
        for r in C.pack_sequences(df, "lang", "doc_id", "n_tokens", budget).collect()
    }
    offsets: dict[str, int] = {}
    want = {}
    for i, (lang, tok) in enumerate(rows):  # doc_id order == list order
        o = offsets.get(lang, 0)
        want[i] = o // budget
        offsets[lang] = o + tok
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # value (incl. negatives)
            st.integers(min_value=0, max_value=50),        # order key with ties
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_global_running_sum_matches_python_model(spark, rows, parts):
    """Property: for any values (negative included), any tie-heavy
    order key, and any partition count, the two-phase prefix sum
    equals the sequential Python cumsum over the total order."""
    df = spark.createDataFrame(
        [(i, v, k) for i, (v, k) in enumerate(rows)], "id BIGINT, v BIGINT, k BIGINT"
    )
    got = {
        r["id"]: r["cum"]
        for r in C.global_running_sum(
            df, ["k", "id"], "v", num_partitions=parts
        ).collect()
    }
    acc, expected = 0, {}
    for i, (v, k) in sorted(enumerate(rows), key=lambda t: (t[1][1], t[0])):
        acc += v
        expected[i] = acc
    assert got == expected
