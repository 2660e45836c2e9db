"""Cross-engine unicode parity boundary.

The oracle harness proves Spark == DuckDB on every registered query,
but all driver testdata is ASCII — so the unicode behavior of the
string functions the queries lean on (lower, regexp token split,
alnum skeleton) is otherwise unexamined. This suite pins the measured
boundary:

- parity-SAFE classes (accented Latin, Greek, CJK, ligatures, sharp-s,
  combining marks): lower(), the `\\s+` tokenizer, and the
  `[^0-9A-Za-z]` skeleton agree byte-for-byte across engines — the
  edges variant injects these into document text and the full sweep
  stays green;
- the KNOWN divergence: Turkish dotted capital İ (U+0130). Spark
  follows the full Unicode case mapping (lower('İ') = 'i' + combining
  dot above, two codepoints); DuckDB simplifies to plain 'i'. Neither
  is wrong; parity breaks. The canonical content fingerprint
  (`normalized_fp_col`) is immune by construction — it strips
  non-alphanumerics BEFORE lowering, so İ never reaches lower() — and
  this suite asserts that immunity. Raw-token queries (tfidf,
  stopword ratios) would hash-diverge on corpora containing İ; that
  is an engine-behavior boundary to normalize at ingest (NFKC +
  locale-aware fold) if Turkish text enters the corpus.
"""

from __future__ import annotations

import duckdb
import pytest

SAFE_TEXTS = [
    "Héllo WÖRLD Ça va",
    "ÅÄÖ åäö ÆØ æø",
    "ß scharfes S",
    "ΣΙΓΜΑ σίγμα τέλος",
    "Москва́ русский",
    "日本語 テスト 中文",
    "ﬁligature ﬂow",
    "á combining acute",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize("text", SAFE_TEXTS)
def test_lower_tokenize_skeleton_parity(spark, duck, text):
    df = spark.createDataFrame([(text,)], "t STRING")
    srow = df.selectExpr(
        "lower(t) AS lo",
        "regexp_replace(t, '[^0-9A-Za-z]', '') AS skel",
        "filter(split(trim(t), '\\\\s+'), x -> x != '') AS toks",
    ).collect()[0]
    dlo, dskel, dtoks = duck.execute(
        "SELECT lower(?), regexp_replace(?, '[^0-9A-Za-z]', '', 'g'), "
        "list_filter(regexp_split_to_array(trim(?), '\\s+'), x -> x <> '')",
        [text, text, text],
    ).fetchone()
    assert srow["lo"] == dlo
    assert srow["skel"] == dskel
    assert list(srow["toks"]) == list(dtoks)


def test_turkish_dotted_i_divergence_is_known(spark, duck):
    """If either engine changes its İ case mapping, this fails and the
    boundary documentation above must be re-verified."""
    df = spark.createDataFrame([("İstanbul",)], "t STRING")
    s_lo = df.selectExpr("lower(t) AS lo").collect()[0]["lo"]
    d_lo = duck.execute("SELECT lower('İstanbul')").fetchone()[0]
    assert s_lo == "i̇stanbul"  # full Unicode mapping: i + combining dot
    assert d_lo == "istanbul"  # simple mapping
    assert s_lo != d_lo


def test_normalized_fingerprint_immune_to_dotted_i(spark, duck):
    """The canonical content fingerprint strips non-alphanumerics
    BEFORE lowering, so the divergent İ never reaches lower() and the
    fingerprints agree across engines."""
    from pyspark.sql import functions as F

    from mozart_etl_spark.operators.text import normalized_fp_col

    df = spark.createDataFrame([("İstanbul VE İzmir!",)], "t STRING")
    s_fp = df.select(normalized_fp_col(F.col("t")).alias("fp")).collect()[0]["fp"]
    d_fp = duck.execute(
        "SELECT md5(lower(regexp_replace('İstanbul VE İzmir!', '[^0-9A-Za-z]', '', 'g')))"
    ).fetchone()[0]
    assert s_fp == d_fp
