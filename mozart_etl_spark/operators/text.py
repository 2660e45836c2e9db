"""Text-analysis transformers for pre-training-corpus pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions``
expressions (whole-stage-codegen friendly); nothing leaves the
executors. The regex dialect used is the ASCII-safe common subset of
Java regex and RE2 so a SQL oracle can mirror the semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n_tokens(text: Column) -> Column:
    """Whitespace token count; empty/whitespace-only text counts 0."""
    return (
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(text), r"\s+")))
        .cast("bigint")
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Char + token counts per document (whitespace tokenization)."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.length(t).cast("bigint").alias("n_chars"),
        _n_tokens(t).alias("n_tokens"),
    )


#: BPE-ish pre-tokenizer: letter runs, digit runs, single
#: non-alphanumeric marks — the ASCII-safe common subset of Java regex
#: and RE2 (mirrors the GPT-2 pre-tokenizer's class structure without
#: \p classes or lookahead, which RE2/DuckDB lack).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count(text: Column, pattern: str = BPE_TOKEN_PATTERN) -> Column:
    """Token count under a BPE-style pre-tokenization regex."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("bigint")


#: Small English stopword set for ratio features (deterministic,
#: mirrored verbatim in SQL oracles).
STOPWORDS: tuple[str, ...] = ("the", "and", "of", "to", "a", "in", "is", "it")


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords (lowercased)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
    return n_stop / F.nullif(_n_tokens(text).cast("double"), F.lit(0.0))


def rolling_hash(text: Column, base: int = 31, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the character stream:
    ``h = (h*base + codepoint) mod m`` — the classic Rabin-Karp
    fingerprint, computed as one codegen-friendly fold (no UDF)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: F.pmod(acc * F.lit(base) + F.ascii(c), F.lit(mod)),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-quality heuristics: alphabetic ratio, whitespace ratio,
    mean token length. The standard cheap filters applied before
    expensive model-based scoring."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("double")
    spaces = F.length(F.regexp_replace(t, "[^ ]", "")).cast("double")
    nonspace = F.length(F.regexp_replace(t, r"\s", "")).cast("double")
    return df.select(
        id_col,
        F.round(alpha / F.nullif(n_chars, F.lit(0.0)), 4).alias("alpha_ratio"),
        F.round(spaces / F.nullif(n_chars, F.lit(0.0)), 4).alias("space_ratio"),
        F.round(nonspace / F.nullif(_n_tokens(t).cast("double"), F.lit(0.0)), 4).alias(
            "mean_token_len"
        ),
    )


def normalized_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Case/punctuation-insensitive content fingerprint (md5 of the
    lowercased alphanumeric skeleton)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "[^0-9A-Za-z]", ""))
    return df.select(id_col, F.md5(norm).alias("norm_fp"))


#: (language, stopwords) pairs scored in order; first match wins.
_LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and")),
    ("de", ("der", "und")),
    ("es", ("el", "los")),
    ("fr", ("le", "les")),
)


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "predicted_lang") -> DataFrame:
    """Deterministic stopword-marker language ID. A real pipeline would
    swap in an n-gram profile model (e.g. fastText via a Pandas UDF);
    the contract — text in, ISO code out, fully distributed — is the
    same."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    expr = F.lit("und")
    # build from the last marker backwards so evaluation order matches
    # the declared first-match-wins priority
    for lang, words in reversed(_LANG_MARKERS):
        cond = F.lit(False)
        for w in words:
            cond = cond | padded.contains(f" {w} ")
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def ngram_phrase_counts(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Corpus n-gram (word) frequency: one row per distinct n-word
    phrase with its corpus count.

    The per-document phrase list is built shuffle-free by zipping
    ``n`` shifted slices of the token array (no self-join, no UDF);
    the single shuffle is the partial-aggregable count on the phrase —
    the shape that survives a 100 TB corpus (map-side combine does
    most of the counting).
    """
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    m = F.greatest(F.size(F.col("w")) - (n - 1), F.lit(0))
    base = df.select(w.alias("w"))
    grams = F.slice(F.col("w"), F.lit(1), m)
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(F.col("w"), F.lit(i + 1), m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return (
        base.select(F.explode(grams).alias("phrase"))
        .groupBy("phrase")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
