"""Scalar function surface (SURVEY.md §2.3 / E10).

The reference's transform layer hands arbitrary Trino SQL to the
executor, so its scalar "library" is whatever the dialect provides;
the new engine inherits Spark SQL's built-ins for free. This module
adds the *engine-specific* expression builders: the reference's model
idioms as composable Column functions, plus the text/similarity
expression helpers used across the query bank. Everything is a pure
JVM-side Column expression — usable in both the DataFrame API and
(via the renderer) SQL models, and whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.text import (
    BPE_TOKEN_PATTERN,
    STOPWORDS,
    regex_token_count,
    rolling_hash,
    stopword_ratio,
)

__all__ = [
    "BPE_TOKEN_PATTERN",
    "STOPWORDS",
    "regex_token_count",
    "rolling_hash",
    "stopword_ratio",
    "partition_key",
    "coalesce_default",
    "uplift",
    "safe_div",
    "epoch_us_bucket",
    "product_cast",
    "widened_sum",
]


def partition_key(*cols: Column | str, sep: str = "_") -> Column:
    """The reference's composite-key idiom
    ``project_id || '_' || plan_ver``
    (``stg_cfg_to_odv_item_master.sql:27``) — NULL-propagating concat,
    matching ANSI ``||`` semantics (E1)."""
    out = None
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        out = col if out is None else F.concat(out, F.lit(sep), col)
    return out


def coalesce_default(col: Column | str, default: str, suffix: str | None = None) -> Column:
    """``COALESCE(col, 'DEFAULT') [|| '_SUFFIX']`` — the reference's
    defaulting-plus-tagging pattern (E2,
    ``stg_cfg_to_odv_item_master.sql:35``)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.coalesce(c, F.lit(default))
    if suffix is not None:
        out = F.concat(out, F.lit(suffix))
    return out


def uplift(col: Column | str, factor: float = 1.1) -> Column:
    """``qty * 1.1`` demand-uplift arithmetic (E5,
    ``stg_cfg_to_odv_demand.sql:39``), computed in DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double") * F.lit(factor)


def safe_div(num: Column, den: Column) -> Column:
    """NULL on zero denominator instead of error/inf."""
    return num / F.nullif(den, F.lit(0))


def epoch_us_bucket(ts_us: Column | str, bucket_us: int) -> Column:
    """Integer-space time bucketing (timezone-proof): floor the
    epoch-microsecond column to a bucket boundary. ``pmod``, not ``%``:
    signed remainder would send pre-1970 (negative-epoch) values to
    the boundary AFTER them instead of flooring."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return (c - F.pmod(c, F.lit(bucket_us))).cast("bigint")


def product_cast(col: Column | str) -> Column:
    """The mart layer's ``::VARCHAR`` product-schema cast (E6,
    ``mart_item_master.sql:9-13``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def widened_sum(col: Column | str) -> Column:
    """Overflow-proof integer fold: SUM in a DECIMAL(38,0)
    accumulator instead of BIGINT (r12 integer-overflow axis).

    The engine posture for plain ``SUM(BIGINT)`` is ANSI-throw
    (session.py RUNTIME_CONFS): a fold crossing 2^63 fails loudly
    rather than wrapping. Where the pipeline semantics demand a VALUE
    past 2^63 — total bytes across replicated shards, token budgets
    multiplied by epoch counts — this is the documented opt-in: cast
    each addend to DECIMAL(38,0) AHEAD of the fold so partial
    (map-side) aggregation already accumulates exactly, headroom
    ~1e38 (any realistic 100 TB fold: 10^13 rows x 10^18 max addend
    needs 10^31 < 10^38). DuckDB's native posture for SUM(BIGINT) is
    HUGEINT (int128) promotion — `CAST(sum(x) AS DECIMAL(38,0))` is
    its oracle twin; parity incl. the 2^63-crossing case is pinned in
    tests/test_overflow_parity.py. Still ANSI-checked: a fold past
    1e38 throws rather than losing digits.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,0)"))
