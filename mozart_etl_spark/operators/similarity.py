"""Embedding similarity search over array<float> columns.

Two strategies:

- **brute_force_knn** — exact: broadcast the (small) query set against
  a full partitioned scan of the candidates. Per-row work is a pure
  JVM fold (zip_with + aggregate) in DOUBLE; no Python in the loop.
  Right answer for query sets up to ~10^4 against arbitrarily large
  candidate tables (the scan is embarrassingly parallel; the only
  shuffle is the final per-query top-k, which is tiny).
- **lsh_knn** — approximate, for large query sets: random-hyperplane
  signs bucket both sides; candidates are compared only within
  matching buckets (equi-join), then exact-scored and top-k'd. This
  is the 100 TB-to-100 TB join path.

**Corrupt-vector policy** (r9 NaN axis + r10 ±Inf and finite-overflow
axes, engine-wide): a vector containing any NaN component, any ±Inf
component, or any finite component with |x| > sqrt(DBL_MAX) — whose
square alone overflows the norm fold to +Inf, so it reproduces the
Inf pathology while passing every isnan/isinf test in both engines —
is CORRUPT DATA.
NaN: its cosine with everything is NaN, and because BOTH Spark and
SQL engines order NaN above every real number, an unguarded corrupt
vector does not merely produce a bad row: it outranks every genuine
neighbor in every ``ORDER BY cosine DESC`` top-k and passes every
``cosine >= threshold`` filter — one poisoned shard silently
pollutes every query's results (consistent across engines, so an
oracle diff alone never catches it). ±Inf is the same class one
step removed: an Inf component makes the squared-norm fold +Inf
(Inf² = Inf regardless of sign) and the dot product ±Inf, so the
cosine is Inf/Inf = **NaN downstream of any NaN-only entry guard**
— ``isnan`` on components passes an Inf vector, and the NaN then
appears first at scoring time with the identical outrank/threshold
pathology. The finite-overflow class (r10) is the same trick one
MORE step removed: |x| > sqrt(DBL_MAX) ≈ 1.34e154 passes isnan AND
isinf everywhere, yet x² alone is +Inf — before this round the
component-form guards kept such vectors (a live cross-engine
divergence on ``knn_bruteforce_cosine`` and a ±1e199-scale poisoned
centroid, demonstrated then injected into the edges profile). Every
scorer therefore drops corrupt vectors at ENTRY using one of two
detectors: the component test ``isnan(x) OR abs(x) > sqrt(DBL_MAX)``
(:func:`_is_corrupt_component`), or the norm test ``isnan(norm) OR
norm = Inf`` (:func:`_norm_is_clean`; NaN propagates through the
fold, Inf and finite-overflow components force norm = +Inf). The
norm form is strictly wider on one residual class — ACCUMULATION
overflow, every |x| ≤ sqrt(DBL_MAX) but the squared sum overflows —
so every ranking additionally applies the score-level backstop
:func:`_score_is_sane` (a non-finite score never ranks, in either
engine).
``brute_force_knn``, ``lsh_knn``, ``ivf_knn`` exclude corrupt
vectors from both sides; ``ivf_centroids`` excludes them from the
mean (one corrupt vector would poison the whole cell centroid and
with it the probe routing); ``lsh_near_dup_pairs`` keeps them
singleton at the collapse fingerprint and its rescoring filter
rejects their NaN pair scores; ``quantize_embeddings`` emits the
NULL-marked row (NULL scale/qvec) a NULL input vector gets —
flagging corruption without silently dropping the id from a storage
pass. The NULL-vector policy is the same exclusion (SQL NULL
semantics make most of it automatic); zero vectors keep their
NULL-cosine ``nullif`` guards; NULL *elements* inside a vector are
NOT corruption (SQL engines skip them in avg; folds turn them into
NULL norms which the norm-form guards exclude as NULL vectors).

The ladder's SHAPE class (r12): a vector whose **length** differs
from the model dimension — the truncated-write / mixed-model-version
ingest corruption. Every value guard passes it (clean finite norm),
yet cross-vector math on it is engine-divergent three ways: Spark's
``zip_with`` dot NULL-pads (NULL score), DuckDB's
``list_dot_product`` errors the whole query, and the two lsh_banded
impls disagreed with each other (arrow raised, JVM silently bucketed
at zero bits). Contract: wrong-length vectors are entry-excluded
wherever a dimension is declared (:func:`_dim_ok` /
:func:`drop_ragged_vectors`; ``lsh_banded``/``lsh_knn``/
``lsh_near_dup_pairs`` always — they already require ``dim`` — and
``brute_force_knn``/``ivf_knn``/``ivf_centroids`` via the optional
``dim`` parameter, which every registered query passes). Per-row
store passes (:func:`quantize_embeddings`) are deliberately
row-faithful instead: no cross-row math, so a ragged row quantizes
against its own length identically in both engines and the store
never silently drops an id. Oracle mirror:
``coalesce(len(v) = dim, TRUE)``.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import default_fold_impl


_INF = float("inf")


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


#: sqrt(DBL_MAX) ≈ 1.3408e154: a component with |x| above this has
#: x² = +Inf on its own, so the vector's squared-norm fold overflows
#: no matter what the other components are. The literal appears
#: verbatim in every oracle's SQL guard — keep them identical.
_OVERFLOW = 1.3407807929942596e154


def _is_corrupt_component(x: Column) -> Column:
    """Component form of the module corrupt-vector detector: NaN, ±Inf
    or finite-overflow — |x| > sqrt(DBL_MAX), the r10 axis: such a
    component is FINITE (passes every isnan/isinf test in both
    engines) but its square alone overflows the norm fold to +Inf, so
    an unguarded scorer inherits the Inf-norm pathology through a
    back door (cosine NaN as a query, fake-0 scores as a candidate,
    a ±1e199-scale poisoned centroid in a mean). A NULL element is
    NOT corruption — the predicate is NULL for it and callers wrap
    the exists() in coalesce(…, True)."""
    xd = x.cast("double")
    return F.isnan(xd) | (F.abs(xd) > F.lit(_OVERFLOW))


def _norm_is_clean(norm: Column) -> Column:
    """Norm form of the detector: a corrupt component makes the
    squared-norm fold NaN (NaN propagates) or +Inf (Inf² = Inf; a
    finite-overflow component squares to Inf alone), so one
    finite-norm test covers all three IEEE corruption classes. NULL
    norm (NULL vector or NULL element) yields NULL — callers
    filtering on this drop those rows, which is the module
    NULL-vector policy. The norm form is strictly WIDER than the
    component form on one residual class: a vector whose components
    are each ≤ sqrt(DBL_MAX) but whose squared SUM overflows
    (accumulation overflow). Scorers guarding with the component
    form rely on the score-level NaN backstop for that class."""
    return ~F.isnan(norm) & (norm != F.lit(_INF))


def _score_is_sane(score: Column) -> Column:
    """Ranking-time backstop (r10): keep a score only if it is NULL
    (zero-norm pairs — both engines rank NULLS LAST) or finite.
    Entry guards should make this a no-op; it exists so that ANY
    residual non-finite score — e.g. the accumulation-overflow class
    the component-form guard cannot see — can never outrank genuine
    neighbors or leak a NaN row, in either engine."""
    return F.coalesce(~F.isnan(score) & (F.abs(score) != F.lit(_INF)), F.lit(True))


def _filter_once(df: DataFrame, cond: Column) -> DataFrame:
    """Apply ``cond`` so every projected column it references is
    evaluated exactly ONCE (r15, guide §4.4's duplication problem in
    its JVM form). Catalyst pushes a post-projection filter below the
    Project and on into the join condition, inlining the projected
    expression into every conjunct — the interpreted dim-length cosine
    fold was evaluated up to 3x per candidate pair (twice in the join
    condition via _score_is_sane's isnan/Inf conjuncts, once in the
    output projection; committed r15 before-plans show it). The pin —
    a ``spark_partition_id()`` column referenced by an always-true
    conjunct — makes the projection nondeterministic and the pin
    column unprunable, so the Filter stays ABOVE the Project and reads
    the computed attribute; codegen fuses Project+Filter into one
    stage. ``spark_partition_id() >= 0`` is vacuously true whatever
    partition a retried/speculated task lands on, so semantics are
    unchanged. Verified: the fold appears exactly once in the plan
    with the pin, 3x without.

    Side effect the call sites compensate for: the pin also blocks
    predicates CATALYST would have derived from the condition from
    reaching the scan (e.g. ``IsNotNull(embedding)`` out of a NULL
    norm failing ``_norm_is_clean``). Sites whose condition provably
    drops NULL inputs re-state that as an explicit deterministic
    filter BELOW the pinned projection, so scan pushdown is
    preserved (pinned by test_plan_expectations' pushed_ge floors).
    """
    pinned = df.withColumn("_eval_pin", F.spark_partition_id())
    return pinned.filter((F.col("_eval_pin") >= 0) & cond).drop("_eval_pin")


def _dim_ok(vec: Column, dim: int | None) -> Column:
    """Ragged-dimension entry guard (r12 axis): a vector whose LENGTH
    differs from the declared model dimension is one more
    corrupt-ingest class — the truncated-write / mixed-model-version
    shape — excluded at entry exactly like the IEEE value classes.
    The value guards cannot see it: a truncated vector has a clean
    finite norm, yet every cross-vector operation on it is undefined
    — Spark's ``zip_with`` dot pads the short side with NULLs (NULL
    score), DuckDB's ``list_dot_product`` ERRORS the whole query, and
    the LSH arrow kernel raised where the JVM HOF fold silently
    bucketed ragged vectors at all-zero bits (NULL projection →
    ``otherwise(0)``) — three different behaviors for one row.
    NULL vectors pass (TRUE) — the NULL-vector policy owns them
    downstream; ``dim=None`` disables the guard (per-row operators
    like :func:`quantize_embeddings` are row-faithful by contract and
    never declare a dim)."""
    if dim is None:
        return F.lit(True)
    return F.when(vec.isNull(), F.lit(True)).otherwise(F.size(vec) == F.lit(dim))


def drop_ragged_vectors(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Entry guard: drop rows whose vector length differs from
    ``dim`` (see :func:`_dim_ok`); NULL vectors are kept for the
    downstream NULL policy. Oracle mirror:
    ``coalesce(len(v) = dim, TRUE)``."""
    return df.filter(_dim_ok(F.col(vec_col), dim))


def drop_corrupt_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Entry guard: drop rows whose vector has any NaN/±Inf component.
    coalesce(True) keeps NULL vectors and vectors with NULL elements
    (exists() is NULL for those) — downstream NULL semantics handle
    them; only IEEE-special corruption is excluded here."""
    return df.filter(
        F.coalesce(
            ~F.exists(vec_col, _is_corrupt_component),
            F.lit(True),
        )
    )


def brute_force_knn(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine 4dp).

    Norms are precomputed per side before the join; the fold order for
    the dot product is the array order, so results are bit-stable
    across partitionings. Corrupt (NaN/±Inf-poisoned) vectors are
    dropped from both sides at entry (module corrupt-vector policy,
    norm form): Spark sorts NaN above every real number, so one
    corrupt candidate would otherwise outrank every genuine neighbor
    in every query's top-k — an Inf component reaches that same NaN
    at the cosine division (Inf/Inf) if only components are checked.
    ``dim`` (r12 ragged axis) additionally excludes wrong-length
    vectors from both sides: without it a ragged QUERY emits k
    NULL-cosine rows (its every dot is NULL via zip_with padding)
    while DuckDB's ``list_dot_product`` errors the whole query —
    declare the model dimension wherever the source can be ragged.
    """
    if dim is not None:
        queries = drop_ragged_vectors(queries, vec_col, dim)
        candidates = drop_ragged_vectors(candidates, vec_col, dim)
    q = _filter_once(
        queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv")))),
        _norm_is_clean(F.col("qn")),
    )
    c = _filter_once(
        candidates.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        _norm_is_clean(F.col("cn")),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    cos_raw = _dot(F.col("qv"), F.col("cv")) / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))
    scored = _filter_once(
        joined.select("query_id", "neighbor_id", cos_raw.alias("cos_raw")),
        _score_is_sane(F.col("cos_raw")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", (F.round("cos_raw", 4) + F.lit(0.0)).alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def ivf_centroids(
    candidates: DataFrame,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Coarse-quantizer centroids per cell: (cell, centroid array).

    Position-wise mean via posexplode + two grouped aggregations — one
    shuffle keyed (cell, dim), one tiny shuffle keyed cell. The cell
    assignment is the ``cell_col`` value (a prior clustering — labels
    here; a k-means pass would produce the same shape). Corrupt
    (NaN/±Inf-poisoned) vectors are excluded from the mean (module
    corrupt-vector policy): one corrupt vector would otherwise turn
    its whole cell's centroid NaN/Inf and with it the probe routing
    of every query. The entry guard keeps rows with NULL elements —
    coalesce(True) in :func:`drop_corrupt_vectors`, because a bare
    NULL exists() predicate would silently drop them from the mean,
    while the oracle's avg skips only the NULL elements. ``dim``
    (r12 ragged axis) excludes wrong-length vectors: the positional
    mean would otherwise average a truncated vector into its leading
    dims only — per-position counts silently diverge and an extended
    vector widens the centroid past the model dimension.
    """
    if dim is not None:
        candidates = drop_ragged_vectors(candidates, vec_col, dim)
    per_dim = (
        drop_corrupt_vectors(candidates, vec_col)
        .select(F.col(cell_col).alias("cell"), F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("v"))
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )


def ivf_knn(
    queries: DataFrame,
    candidates: DataFrame,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style approximate cosine top-k.

    Inverted-file search: (1) build per-cell centroids (the coarse
    index); (2) each query probes its ``nprobe`` nearest centroids;
    (3) exact scoring only against candidates in the probed cells —
    an equi-join on cell, never a full scan. With C cells and uniform
    occupancy the scored fraction is nprobe/C; at 100 TB the
    candidate side stays partitioned by cell (cluster-by on write)
    so each probe touches only its cells' files.
    """
    # Corrupt vectors are excluded from both sides at entry by the
    # NORM form of the module detector (r11 — the component form let
    # an accumulation-overflow candidate through: norm = +Inf with
    # every component finite and <= sqrt(DBL_MAX), scoring a fake
    # finite/Inf = 0.0 against clean queries that _score_is_sane
    # cannot reject yet can outrank genuinely negative neighbors).
    # The norms are needed for the cosines anyway, so the guard rides
    # the projection that precomputes them per VECTOR — never per
    # pair. ivf_centroids applies its own component-form guard with
    # NULL-element tolerance internally (avg semantics differ there).
    # ``dim`` (r12 ragged axis) excludes wrong-length vectors from the
    # centroids, both scoring sides, and the probe routing.
    if dim is not None:
        queries = drop_ragged_vectors(queries, vec_col, dim)
        candidates = drop_ragged_vectors(candidates, vec_col, dim)
    cents = ivf_centroids(candidates, cell_col, id_col, vec_col, dim=dim)
    q = _filter_once(
        queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv")))),
        _norm_is_clean(F.col("qn")),
    )
    # probe: rank centroids per query by cosine, keep top nprobe
    qc = q.crossJoin(F.broadcast(cents))
    cos_cent = _dot(F.col("qv"), F.col("centroid")) / F.nullif(
        F.col("qn") * F.sqrt(_dot(F.col("centroid"), F.col("centroid"))),
        F.lit(0.0),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("cent_cos"), F.asc("cell"))
    probes = (
        _filter_once(
            qc.select("query_id", "qv", "qn", "cell", cos_cent.alias("cent_cos")),
            _score_is_sane(F.col("cent_cos")),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cell")
    )
    c = _filter_once(
        candidates.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col(cell_col).alias("cell"),
    ).withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        _norm_is_clean(F.col("cn")),
    )
    joined = c.join(F.broadcast(probes), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos_raw = _dot(F.col("qv"), F.col("cv")) / F.nullif(
        F.col("qn") * F.col("cn"), F.lit(0.0)
    )
    scored = _filter_once(
        joined.select("query_id", "neighbor_id", cos_raw.alias("cos_raw")),
        _score_is_sane(F.col("cos_raw")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", (F.round("cos_raw", 4) + F.lit(0.0)).alias("cosine"))
    )


def lsh_banded(
    df: DataFrame,
    dim: int,
    out_id: str,
    out_vec: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    impl: str | None = None,
) -> DataFrame:
    """Multi-table random-hyperplane banding: (id, vec, table_id, bucket).

    One scan: all tables' buckets as an array, posexploded to
    (table_id, bucket) rows.

    - ``impl="arrow"`` (default): the projection matrix runs as one
      numpy matmul per Arrow batch — ``(batch, dim) @ (dim,
      n_tables*n_planes)`` — behind ``mapInPandas``; the explode to
      (table_id, bucket) rows stays JVM-side. ~5x faster than the
      HOF fold at sf0.1 (0.3 s vs 1.5 s for 2 000x64-dim vectors):
      dense float linear algebra is BLAS's home turf, while Spark
      higher-order functions evaluate interpreted per element. Sign
      decisions match the JVM fold except for projections within
      ~1 ulp of 0 (matmul may reorder the additions) — the pair sets
      downstream are recall-pinned, not bit-pinned, and the property
      suite has never produced a divergence. A NULL vector gets
      all-zero buckets on both paths; NaN elements set every bit on
      both paths (Spark orders NaN above all numbers, the kernel
      mirrors it with ``~(proj < 0)``). One malformed-input case
      diverges between the paths and is UNDEFINED by contract: a
      NULL *element* inside a vector (Arrow surfaces it to the
      kernel as NaN — indistinguishable from a genuine NaN, so it
      sets every bit, where the JVM fold's NULL projection yields
      0 bits). Validate upstream if the source can produce one.
      Ragged vectors (length != ``dim``) are no longer undefined:
      the r12 axis made them an entry-EXCLUDED class (:func:`_dim_ok`
      filter on ``base``, identical in both impls) — before it the
      arrow kernel raised ``ValueError`` on the whole query while
      the JVM fold silently gave the ragged vector all-zero bits
      (its every projection is NULL via zip_with padding, and
      ``otherwise(0)`` reads that as a 0 bit), funneling every
      ragged vector into one shared bucket per table — a measured
      cross-impl divergence AND a hot-bucket hazard. The kernel's
      ValueError stays as an unreachable-by-contract assertion.
    - ``impl="jvm"``: the single-Literal HOF fold below — kept for
      Python-worker-free deployments. The vector cast happens once
      per row (multi-referenced projection, so CollapseProject keeps
      the barrier) instead of once per table.
    """
    base = df.filter(_dim_ok(F.col(vec_col), dim)).select(
        F.col(id_col).alias(out_id), _as_double(F.col(vec_col)).alias(out_vec)
    )
    impl = impl or default_fold_impl()
    if impl == "arrow":
        all_planes_np = [
            p for t in range(n_tables) for p in _hyperplanes(dim, n_planes, seed + t)
        ]
        out_schema = T.StructType(
            [
                T.StructField(out_id, base.schema[out_id].dataType),
                T.StructField(out_vec, T.ArrayType(T.DoubleType())),
                T.StructField("buckets", T.ArrayType(T.LongType())),
            ]
        )

        def project(batches):
            import numpy as np
            import pandas as pd

            planes = np.array(all_planes_np, dtype=np.float64).T  # (dim, n_all)
            weights = np.array(
                [1 << (i % n_planes) for i in range(n_tables * n_planes)],
                dtype=np.int64,
            )
            for pdf in batches:
                mats, idx = [], []
                for j, v in enumerate(pdf[out_vec]):
                    if v is not None:
                        a = np.asarray(v, dtype=np.float64)
                        if a.shape != (dim,):
                            raise ValueError(
                                f"lsh_banded: vector for {out_id}="
                                f"{pdf[out_id].iloc[j]!r} has length "
                                f"{a.shape[0] if a.ndim == 1 else a.shape} "
                                f"but dim={dim}"
                            )
                        mats.append(a)
                        idx.append(j)
                buckets = [np.zeros(n_tables, dtype=np.int64)] * len(pdf)
                if mats:
                    proj = np.stack(mats) @ planes  # (rows, n_all)
                    bits = (~(proj < 0.0)).astype(np.int64) * weights[None, :]
                    per_table = bits.reshape(len(mats), n_tables, n_planes).sum(axis=2)
                    for row, j in enumerate(idx):
                        buckets[j] = per_table[row]
                yield pd.DataFrame(
                    {
                        out_id: pdf[out_id],
                        out_vec: pdf[out_vec],
                        "buckets": buckets,
                    }
                )

        banded = base.mapInPandas(project, out_schema)
        return banded.select(
            out_id, out_vec, F.posexplode("buckets").alias("table_id", "bucket")
        )
    # All n_tables*n_planes hyperplanes as ONE constant-folded nested
    # array literal, projected in a single transform and folded into the
    # per-table bucket array with a single aggregate. The naive
    # formulation (one aggregate-of-64-literals expression per plane per
    # table) generates a codegen tree that grows as tables*planes*dim
    # and dominated wall time; this shape is three constants plus two
    # compact loops. The projection array is the *input argument* of
    # the fold (evaluated once per row — CollapseProject-safe).
    n_all = n_tables * n_planes
    all_planes = [
        [float(x) for x in p] for t in range(n_tables) for p in _hyperplanes(dim, n_planes, seed + t)
    ]
    # Single Literal nodes (nested-list F.lit), NOT per-element F.lit
    # trees: n_tables*n_planes*dim literal expression nodes made
    # Catalyst analysis the dominant cost (seconds per query, flat in
    # row count) — as one Literal the tree is 3 constants.
    planes_lit = F.lit(all_planes)
    # per plane index i: owning table t = i // n_planes, bit weight 2^(i % n_planes)
    tbl_lit = F.lit([i // n_planes for i in range(n_all)])
    wt_lit = F.lit([1 << (i % n_planes) for i in range(n_all)]).cast("array<bigint>")
    projs = F.transform(planes_lit, lambda p: _dot(F.col(out_vec), p))
    contrib = F.zip_with(
        projs,
        F.sequence(F.lit(1), F.lit(n_all)),
        lambda p, i: F.struct(
            F.element_at(tbl_lit, i).alias("t"),
            F.when(p >= 0, F.element_at(wt_lit, i)).otherwise(F.lit(0).cast("bigint")).alias("c"),
        ),
    )
    buckets = F.aggregate(
        contrib,
        F.array_repeat(F.lit(0).cast("bigint"), n_tables),
        lambda acc, s: F.transform(acc, lambda x, ti: F.when(ti == s["t"], x + s["c"]).otherwise(x)),
    )
    return base.select(
        out_id, out_vec, F.posexplode(buckets).alias("table_id", "bucket")
    )


def lsh_knn(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via shared LSH buckets (equi-joins).

    Multi-table LSH: ``n_tables`` independent bucketings (different
    hyperplane seeds); a pair is a candidate if it collides in ANY
    table. Collision probability for angle θ is
    1 - (1 - (1 - θ/π)^n_planes)^n_tables — tables buy recall, planes
    buy precision. Each table is one equi-join on (table_id, bucket);
    candidates dedup before exact scoring so every pair is scored once.
    """
    # Corrupt (NaN/±Inf) vectors are dropped from both sides BEFORE
    # banding (module corrupt-vector policy): the banding kernel maps
    # a NaN projection to an all-ones bucket, which would funnel every
    # corrupt vector into one hot bucket and then rank it above every
    # real neighbor (NaN cos_raw sorts first under desc); an Inf
    # vector's projections are ±Inf — deterministic buckets, but its
    # pair scores are Inf/Inf = NaN with the same outranking.
    # Ragged (length != dim) vectors are excluded up front too (r12
    # axis) — lsh_banded's own entry guard would keep them out of the
    # bucket joins anyway, but dropping them here keeps the rescore
    # frames (qv/cv) consistent with the banded universe by
    # construction, not merely by join reachability.
    queries = drop_ragged_vectors(drop_corrupt_vectors(queries, vec_col), vec_col, dim)
    candidates = drop_ragged_vectors(drop_corrupt_vectors(candidates, vec_col), vec_col, dim)
    # bucket join + pair dedup shuffle IDs ONLY — at corpus scale the
    # dominant shuffle would otherwise carry every 64-float vector
    # once per colliding table; vectors re-attach by id afterwards
    qb = lsh_banded(
        queries, dim, "query_id", "qv", id_col, vec_col, n_planes, n_tables, seed
    ).select("query_id", "table_id", "bucket")
    cb = lsh_banded(
        candidates, dim, "neighbor_id", "cv", id_col, vec_col, n_planes, n_tables, seed
    ).select("neighbor_id", "table_id", "bucket")
    pairs = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # norms precomputed per VECTOR (multi-referenced projection — no
    # CollapseProject inlining), never per candidate pair. The NORM
    # form of the corrupt-vector guard rides the same projection
    # (r11): the component-form entry guard above cannot see an
    # accumulation-overflow vector (norm = +Inf, every component
    # finite), which would score a fake finite/Inf = 0.0 into top-k
    # slots past the _score_is_sane backstop.
    qv = _filter_once(
        queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv")))),
        _norm_is_clean(F.col("qn")),
    )
    cv = _filter_once(
        candidates.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        _norm_is_clean(F.col("cn")),
    )
    joined = pairs.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
    cos_raw = _dot(F.col("qv"), F.col("cv")) / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))
    scored = _filter_once(
        joined.select("query_id", "neighbor_id", cos_raw.alias("cos_raw")),
        _score_is_sane(F.col("cos_raw")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", (F.round("cos_raw", 4) + F.lit(0.0)).alias("cosine"))
    )


def auto_lsh_params(
    n_rows: int,
    threshold: float,
    target_occupancy: int = 32,
    target_recall: float = 0.95,
    min_planes: int = 4,
    max_planes: int = 16,
    max_tables: int = 32,
) -> tuple[int, int]:
    """Resolve (n_planes, n_tables) from corpus size and similarity
    threshold — the knob a FIXED banding configuration lacks at scale.

    With fixed planes, expected bucket occupancy grows linearly with
    the corpus, and within-bucket candidate pairs grow with its
    SQUARE: the sf1.0 stress bench measured ~15x growth per 10x data
    for the fixed 6x6 configuration (SCALING.md). Two closed forms fix
    the parameters instead of guesswork:

    - planes: ``ceil(log2(n_rows / target_occupancy))`` keeps expected
      bucket occupancy ~constant as the corpus grows (each extra plane
      doubles the bucket count), clamped to [min_planes, max_planes]
      (the bucket weight fold packs one bit per plane into an int64).
    - tables: per-plane collision odds for angle θ = acos(threshold)
      are ``p = 1 - θ/π`` (random-hyperplane LSH), so one r-plane
      table catches a qualifying pair with ``p^r`` and T tables reach
      recall ``1 - (1 - p^r)^T``; the smallest T meeting
      ``target_recall`` is ``ceil(log(1-recall) / log(1-p^r))`` —
      longer signatures are compensated with more tables instead of
      silently trading recall away.

    Cost containment (``max_tables``): each table is a full bucket
    self-join, so the table count is a direct multiplier on candidate
    generation. A low threshold (wide angle -> small per-table
    collision odds) can demand hundreds of tables for the recall
    target — at threshold 0.5 the raw formula wants ~2000 — which
    would EXPLODE cost instead of containing it. Tables are therefore
    clamped to ``max_tables``; if the clamp alone cannot reach the
    recall target, planes are walked back below the occupancy-optimal
    value (shorter signatures -> higher per-table odds) until it can.
    Fewer planes means fuller buckets — the quadratic term returns —
    so the walk-back floor is ``min_planes``; if even
    (min_planes, max_tables) misses the recall target the function
    raises ValueError naming the gap, because silently returning a
    configuration that is either unaffordable or under-recall would
    hide exactly the failure this resolver exists to prevent. Pick
    explicit parameters (or a lower ``target_recall``) in that regime.

    At the driver corpus (~500-2k vectors, threshold 0.95) this
    resolves to ~(6, 4) — the certified explicit configuration's
    scale; at 20k it resolves to (10, 8) cutting candidate volume
    ~12x; at 2M it hits the plane cap with 15 tables and ~30/bucket.
    """
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi

    def tables_for(planes: int) -> int | None:
        """Smallest T with recall 1-(1-p^planes)^T >= target, or None
        if that T would exceed max_tables (p^planes too small)."""
        per_table = p**planes
        if per_table >= 1.0:  # threshold 1.0 -> p == 1, one table suffices
            return 1
        if per_table <= 0.0:  # threshold -1.0 -> p == 0: no recall possible
            return None
        t = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - per_table)))
        return t if t <= max_tables else None

    planes = min_planes
    if n_rows > target_occupancy:
        planes = max(min_planes, min(max_planes, math.ceil(math.log2(n_rows / target_occupancy))))
    # occupancy-optimal planes first; walk back toward min_planes only
    # as far as the recall target forces
    for cand_planes in range(planes, min_planes - 1, -1):
        tables = tables_for(cand_planes)
        if tables is not None:
            return cand_planes, tables
    raise ValueError(
        f"auto_lsh_params: recall target {target_recall} at threshold {threshold} "
        f"needs more than max_tables={max_tables} tables even at min_planes="
        f"{min_planes} (per-table collision odds {p**min_planes:.3g}); pass "
        "explicit (n_planes, n_tables) or lower target_recall"
    )


#: floor on candidate pairs per rescore partition: each pair costs two
#: vector attaches plus a dim-length interpreted fold (~microseconds of
#: CPU), so a partition must hold enough pairs to amortize its task.
_RESCORE_MIN_PAIRS_PER_PARTITION = 4096
#: bytes AQE sees per candidate row in the dedup exchange (two int64
#: ids + row overhead) — used only to predict when byte-based
#: coalescing will under-parallelize the CPU-heavy rescore.
_CAND_PAIR_BYTES = 48


def _parse_size_bytes(text: str | None, default: int = 64 * 1024 * 1024) -> int:
    """Bytes for a Spark size conf value: bare ints are bytes, and the
    human-readable suffixes Spark itself accepts (``64MB``, ``256m``,
    ``1g``, ``512k``, ``128b``, any case, optional trailing ``b``) are
    scaled binary units. r15 ADVICE fix: ``int()`` raised on every
    suffixed value, so a user-RAISED advisory size — where AQE
    coalesces harder and the rescore rescue is needed most — silently
    fell back to the 64 MiB default and overestimated ``aqe_parts``.
    The default covers only unset/unparseable values."""
    if text is None:
        return default
    s = str(text).strip().lower()
    try:
        return int(s)
    except ValueError:
        pass
    import re

    m = re.fullmatch(r"(\d+)\s*([kmgtp])?b?", s)
    if not m:
        return default
    scale = {None: 0, "k": 10, "m": 20, "g": 30, "t": 40, "p": 50}[m.group(2)]
    return int(m.group(1)) << scale


def _rescore_parallelism_rescue(
    cand: DataFrame, n_rows: int | None, n_planes: int, n_tables: int
) -> DataFrame:
    """Repartition the id-only candidate pairs before the vector
    re-attach when AQE's BYTE-based partition coalescing would leave
    the CPU-heavy exact rescore under-parallelized (r14, guide §2.5).

    The dedup exchange carries ~16 B/pair, so AQE coalesces it to a
    handful of partitions — but each pair downstream costs two vector
    lookups plus a dim-length cosine fold, ~3 orders of magnitude
    more CPU per byte than AQE's sizing model assumes (measured at
    sf0.1: 135k candidates coalesced to 2 partitions, the rescore ran
    on 2 of 32 cores, 1.47 s -> 0.95 s with the rescue). Data-derived
    at both ends like io.fan_out_scan: expected candidate volume
    comes from the occupancy model that sized the banding
    (E[pairs] ~= tables * n * n / 2^planes / 2), the partition count
    is what that volume justifies (>= _RESCORE_MIN_PAIRS_PER_PARTITION
    pairs each, capped at defaultParallelism), and the rescue is
    SKIPPED when AQE's own byte math already yields at least that
    many partitions — at cluster scale the candidate table is
    gigabytes and coalescing never under-shoots, so this inserts no
    shuffle there. Only the auto-params path (which already counted
    the corpus) can estimate volume; explicit-params callers are
    unchanged.
    """
    if n_rows is None or n_rows <= 0:
        return cand
    spark = cand.sparkSession
    est_pairs = int(n_tables * n_rows * (n_rows / 2**n_planes) / 2)
    justified = min(
        spark.sparkContext.defaultParallelism,
        max(1, est_pairs // _RESCORE_MIN_PAIRS_PER_PARTITION),
    )
    advisory = _parse_size_bytes(
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    )
    aqe_parts = max(1, est_pairs * _CAND_PAIR_BYTES // advisory)
    if justified > aqe_parts:
        return cand.repartition(justified)
    return cand


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | str = 8,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    collapse_identical: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: LSH-bucketed candidate
    generation + exact cosine rescoring — never an all-pairs join.

    Output: (doc_a, doc_b, cosine 4dp) with doc_a < doc_b and
    cosine >= ``threshold``. Self-join on (table_id, bucket): only
    vectors that collide in at least one LSH table are scored, so the
    join stays equi-join-shaped (AQE-skew-splittable) and the scored
    fraction shrinks with bucket granularity. For cosine >= 0.95
    (angle <= ~18 deg) a single 8-plane table collides with p ~= 0.43;
    8 independent tables give pair recall ~= 1 - (1-0.43)^8 > 0.98 —
    pinned against the exact all-pairs twin in tests.

    ``n_planes="auto"`` resolves BOTH banding parameters from the
    actual corpus size and ``threshold`` via :func:`auto_lsh_params`
    (``n_tables`` is then ignored): bucket occupancy stays ~constant
    as the corpus grows, so candidate volume grows linearly instead of
    quadratically, and table count preserves the recall target. Costs
    one ``count()`` of the input (parquet-metadata-cheap). "auto" is
    the certified default of the registered ``dedup_embedding_lsh``
    query since r7 — the sf1.0 stress decade measured the fixed 6x6
    configuration at 10.7x/decade growth vs 1.8x under "auto", with
    the identical 20-pair output (SCALING.md / COVERAGE.md); explicit
    integers remain available where exact banding reproducibility
    across differently-sized corpora matters more than scaling.

    ``max_bucket_size`` (default ``None`` = off, identical plan) is
    the embedding twin of the MinHash band join's hot-bucket cap
    (:func:`~mozart_etl_spark.operators.dedup.signature_band_pairs`):
    a cluster of IDENTICAL embeddings (one document ingested k times)
    lands in the same bucket of every table and pairs quadratically —
    occupancy-tuned planes cannot damp true identical-vector
    clusters. When set, any (table_id, bucket) with more than this
    many members is dropped before the self-join, bounding worst-case
    candidates at n_buckets·cap² per table. A pair lost with one hot
    bucket still collides in its other ``n_tables-1`` tables
    independently; the recall loss concentrates on clusters larger
    than the cap, whose true pair set is quadratic.

    ``collapse_identical`` (default ``False`` = exact current
    behavior) stages the embedding analogue of the MinHash chain's
    exact-duplicate collapse — the companion that makes a cap safe
    under the giant-identical-cluster adversary (one document
    embedded k times: every bucket of every table is hot, so a cap
    alone would drop the WHOLE cluster). Identical vectors — md5 of
    the STRING rendering of the double array, so "identical" means
    value-identical after the double cast; zero-norm, NULL, and
    NaN-containing vectors stay singletons — collapse
    to their min-id representative before banding; members
    rejoin as (rep, member) star edges with cosine exactly 1.0 —
    sound because an identical vector has identical cosine to every
    other vector, so every edge a member would contribute exists
    through its representative. The output is then the SPANNING
    structure per identical-byte cluster rather than all C(k,2)
    pairs (k-1 star edges; cross-cluster pairs appear once at rep
    level): connected components — what a dedup pipeline consumes —
    are provably unchanged, while candidate volume becomes
    independent of identical-cluster size. Distinct-byte vectors
    (e.g. positively scaled copies) are NOT collapsed and flow
    through banding as before.
    """
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2 (a bucket of 2 is one pair)")
    star = None
    if collapse_identical:
        base = df.select(
            F.col(id_col).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
        )
        # zero-norm / NULL / NaN / Inf / ragged vectors never reach
        # the threshold filter on the band path (cosine is NULL or
        # NaN there — for Inf pairs the division is Inf/Inf = NaN;
        # ragged vectors are excluded by lsh_banded's dim guard), so
        # a 1.0 star edge for them would be wrong — each stays its
        # own singleton group. NaN and Inf each need the explicit
        # guard: Spark sorts NaN greatest and +Inf above every
        # finite, so a plain norm>0 test would collapse NaN- or
        # Inf-identical vectors into cosine-1.0 star edges their true
        # (NaN) cosine does not support (module corrupt-vector
        # policy, norm form). Ragged needs its own guard here (r12):
        # a truncated vector has a clean norm > 0, and two identical
        # ragged vectors WOULD collapse into a star edge the band
        # path never supports for them.
        norm = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
        key = F.when(
            (norm > 0) & _norm_is_clean(norm) & _dim_ok(F.col("_cv"), dim),
            F.md5(F.col("_cv").cast("string")),
        ).otherwise(F.concat(F.lit("__solo__"), F.col("_cid").cast("string")))
        # one ordered window drives both the representative id (first
        # by id = min) and the row-unique pick: exactly ONE row per
        # fingerprint group enters banding, so replayed-CDC duplicate
        # rows (same id, same vector — bit-identical by contract)
        # collapse idempotently instead of flowing through as
        # duplicate representative rows that would fan out every
        # rescore join touching them (r13; the oracle mirrors with
        # GROUP BY fingerprint).
        # NULL-safe representative pick (r14 advisor): Spark default
        # ASC is NULLS FIRST and first() keeps nulls, so a group
        # containing a NULL id would elect _rep_id=NULL — every star
        # edge then dies in the `_cid != _rep_id` NULL comparison and
        # the NULL-id row becomes the banding representative. Order
        # nulls LAST and skip them in first(): _rep_id is the MIN
        # non-null id, matching the oracle's min(vec_id) under
        # DuckDB's NULLS LAST default. A NULL-id member itself still
        # contributes no star edge (NULL != rep is NULL on both
        # engines — the shared corrupt-id policy).
        wv = Window.partitionBy("_vfp").orderBy(F.col("_cid").asc_nulls_last())
        base = (
            base.withColumn("_vfp", key)
            .withColumn("_rep_id", F.first("_cid", ignorenulls=True).over(wv))
            .withColumn("_rn", F.row_number().over(wv))
            .localCheckpoint(eager=False)
        )
        star = base.filter(F.col("_cid") != F.col("_rep_id")).select(
            F.col("_rep_id").alias("doc_a"),
            F.col("_cid").alias("doc_b"),
            F.lit(1.0).alias("cosine"),
        )
        df = base.filter(F.col("_rn") == 1).select(
            F.col("_cid").alias(id_col), F.col("_cv").alias(vec_col)
        )
    n_rows = None
    if n_planes == "auto":
        n_rows = df.count()
        n_planes, n_tables = auto_lsh_params(n_rows, threshold)
    # Candidate generation carries ONLY ids through the self-join and
    # dedup shuffles — at dim=64 a vector is ~0.5 KB/row vs 16 B for an
    # id pair, a ~30x shuffle-volume difference. Vectors (with norms
    # precomputed once per doc, not once per pair) are joined back for
    # the exact rescoring of the deduped candidates; at this table size
    # AQE picks a broadcast for the vector side, at 100 TB it degrades
    # to a shuffle join on id — both correct.
    # localCheckpoint: both self-join sides read the banded frame, so a
    # materialization barrier stops the banding expression (the
    # dominant fixed cost) being evaluated once per side. The
    # lineage-truncated blocks are released by the ContextCleaner when
    # the plan is GC'd — no session-lifetime memory pin (vs persist()).
    b = lsh_banded(df, dim, "doc_id", "v", id_col, vec_col, n_planes, n_tables, seed).select(
        "doc_id", "table_id", "bucket"
    )
    if max_bucket_size is not None:
        # applied BEFORE the checkpoint barrier so the occupancy window
        # is evaluated once into the materialized blocks — after it,
        # both self-join sides would recompute the count independently
        bucket_n = F.count(F.lit(1)).over(Window.partitionBy("table_id", "bucket"))
        b = b.withColumn("_bucket_n", bucket_n).filter(
            F.col("_bucket_n") <= max_bucket_size
        ).drop("_bucket_n")
    b = b.localCheckpoint(eager=False)
    a = b.select(F.col("doc_id").alias("doc_a"), "table_id", "bucket")
    c = b.select(F.col("doc_id").alias("doc_b"), "table_id", "bucket")
    cand = (
        a.join(c, ["table_id", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = _rescore_parallelism_rescue(cand, n_rows, n_planes, n_tables)
    vecs = df.select(
        F.col(id_col).alias("doc_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    va = vecs.select(F.col("doc_id").alias("doc_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = vecs.select(F.col("doc_id").alias("doc_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    cos_raw = _dot(F.col("va"), F.col("vb")) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
    out = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("cos_raw", cos_raw)
    )
    # ~isnan: Spark sorts NaN greatest, so `NaN >= threshold` is
    # TRUE — without the guard a NaN-norm (NaN-component) vector
    # pair would pass the similarity filter with cosine NaN.
    # Zero-norm needs no twin guard: nullif makes its cosine NULL,
    # and NULL >= threshold is NULL (filtered). Inf vectors need
    # no extra guard HERE either: an Inf-norm pair's cosine is
    # always ±Inf/Inf or NaN/Inf = NaN (caught), or finite/Inf = 0
    # (below threshold) — pinned by the r10 Inf-axis unit tests.
    # _filter_once: without the pin this filter is pushed into the
    # vector join's condition and the fold runs up to 3x per pair.
    out = _filter_once(
        out, (F.col("cos_raw") >= threshold) & ~F.isnan("cos_raw")
    ).select("doc_a", "doc_b", (F.round("cos_raw", 4) + F.lit(0.0)).alias("cosine"))
    if star is not None:
        out = out.unionByName(star)
    return out


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    impl: str | None = None,
    checksums: bool = False,
) -> DataFrame:
    """Symmetric per-vector integer quantization (the int8 compression
    pass embedding stores run before serving): ``scale = max|x| / qmax``
    and ``q_i = round(x_i / scale)`` with ``q_i`` in [-qmax, qmax].
    4× smaller storage and cheap integer dot products, at ~1e-2
    recall-neutral error for normalized embeddings.

    Zero shuffles, linear in corpus size, bit-deterministic under any
    partitioning (the max-abs reduction is exact in any order; the
    per-element round is elementwise). A zero vector keeps scale NULL
    (nothing to quantize), and so does a DENORMAL vector whose
    max|x| < ~3.2e-321: its scale max|x|/127 underflows to exactly
    0.0, which would divide-by-zero (ANSI error on the JVM path,
    garbage zeros on the arrow path) — scale-underflow is treated as
    one more NULL-marked class, gated on the computed scale rather
    than on max|x|. A corrupt (NaN- or ±Inf-poisoned) vector
    gets the same NULL-marked row (NULL scale, NULL qvec) a NULL
    input vector gets (module corrupt-vector policy): a NaN component
    makes the raw max-abs NaN, and an Inf component makes it +Inf —
    without the guard the NaN case would cast garbage zeros while a
    SQL engine errors, and the Inf case is sneakier: scale = Inf is a
    perfectly castable number, every finite quotient x/Inf rounds to
    qvec 0, and the Inf component itself quantizes Inf/Inf = NaN ->
    int 0 — a row of plausible-looking zeros with an unusable scale,
    silently corrupting the store in BOTH engines.

    ``checksums=True`` additionally emits ``q_sum``/``q_l1`` (BIGINT
    sum and L1 of the quantized array) — order-independent exact
    integer digests, the certification surface for a store whose
    float arrays are not hash-comparable.

    - ``impl="arrow"`` (default, ``SPARK_GRAFT_FOLD_IMPL``
      overridable): one vectorized numpy pass per Arrow batch behind
      ``mapInPandas`` — vectors flatten to a single buffer and
      ``np.maximum.reduceat`` / ``np.add.reduceat`` fold per-row
      segments, so per-element work is C, not interpreted expression
      evaluation (the r9 round measured the interpreted HOF fold
      chain at 6.4x the pre-guard cost; this kernel is the same
      ~5x-faster move lsh_banded made). Bit-identical to the JVM
      fold BY CONSTRUCTION, not merely in practice: max() of doubles
      is exact in any order, the quotient is a single IEEE division
      on both paths, and the kernel's trunc+frac round reproduces
      round-half-away-from-zero exactly (|q| <= qmax + 1 so the
      fractional part is exact; Spark's HALF_UP on a double's
      shortest decimal representation decides every boundary the
      same way because the shortest repr of v < 0.5 is itself
      < 0.5). The bit-identity is gate-verified per round
      (SPARK_GRAFT_FOLD_IMPL=jvm) and property-pinned in
      tests/test_knn_properties.py.
    - ``impl="jvm"``: the higher-order-function folds (one
      ``aggregate`` for max|x|, one ``transform`` for the array, one
      ``aggregate`` per checksum) — kept for Python-worker-free
      deployments.

    A vector containing a NULL *element* is UNDEFINED by contract
    across the two impls (same boundary as lsh_banded): Arrow
    surfaces the element to the kernel as NaN — indistinguishable
    from genuine corruption, NULL-marked row — while the JVM
    ``greatest`` fold skips the NULL and quantizes the remaining
    components against a max that ignores it. Validate upstream if
    the source can produce NULL elements.
    """
    qmax = 2 ** (bits - 1) - 1
    impl = impl or default_fold_impl()
    if impl == "arrow":
        id_type = df.schema[id_col].dataType
        fields = [
            T.StructField(id_col, id_type),
            T.StructField("scale", T.DoubleType()),
            T.StructField("qvec", T.ArrayType(T.IntegerType())),
        ]
        if checksums:
            fields += [
                T.StructField("q_sum", T.LongType()),
                T.StructField("q_l1", T.LongType()),
            ]
        out_schema = T.StructType(fields)

        def quantize(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                n = len(pdf)
                # object columns: NULL must reach Arrow as None — a
                # float-dtype NaN is indistinguishable from a data NaN
                scale_out = np.full(n, None, dtype=object)
                qvec_out: list = [None] * n
                qsum_out = np.full(n, None, dtype=object)
                ql1_out = np.full(n, None, dtype=object)
                vecs = [
                    (j, np.asarray(v, dtype=np.float64))
                    for j, v in enumerate(pdf[vec_col])
                    if v is not None and len(v) > 0
                ]
                if vecs:
                    lens = np.array([a.size for _, a in vecs])
                    flat = np.concatenate([a for _, a in vecs])
                    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    bounds = np.cumsum(lens)
                    max_abs = np.maximum.reduceat(np.abs(flat), starts)
                    # scale is computed BEFORE the ok mask so the mask can
                    # reject scale underflow: for max_abs < ~3.2e-321 the
                    # quotient max_abs/127 is a subnormal that flushes to
                    # exactly 0.0, and an ok row with scale 0 would emit
                    # the same plausible-zeros-with-unusable-scale garbage
                    # the Inf guard exists for (scale > 0 also covers
                    # max_abs == 0 and NaN; isfinite still rejects +Inf)
                    scale_raw = max_abs / float(qmax)
                    ok = np.isfinite(max_abs) & (max_abs <= _OVERFLOW) & (scale_raw > 0.0)
                    scale = np.where(ok, scale_raw, np.nan)
                    # round half away from zero, exactly as Spark's
                    # HALF_UP and DuckDB/C++ round(): |x| <= qmax + 1
                    # keeps the fractional part exactly representable,
                    # so the >= 0.5 comparison is exact. Corrupt rows
                    # (ok=False) compute garbage lanes that are never
                    # read — errstate silences their IEEE warnings.
                    with np.errstate(invalid="ignore", over="ignore"):
                        x = flat / np.repeat(np.where(ok, scale, 1.0), lens)
                        t = np.trunc(x)
                        q = np.where(
                            np.isfinite(x),
                            t + np.where(np.abs(x - t) >= 0.5, np.copysign(1.0, x), 0.0),
                            0.0,
                        ).astype(np.int64)
                    sums = np.add.reduceat(q, starts)
                    l1s = np.add.reduceat(np.abs(q), starts)
                    # zero-length reduceat segments can't occur: empty
                    # vectors were filtered with the NULLs above
                    for row, (j, _) in enumerate(vecs):
                        if ok[row]:
                            scale_out[j] = float(scale[row])
                            qvec_out[j] = q[starts[row] : bounds[row]].astype(np.int32)
                            qsum_out[j] = int(sums[row])
                            ql1_out[j] = int(l1s[row])
                cols = {
                    id_col: pdf[id_col],
                    "scale": scale_out,
                    "qvec": qvec_out,
                }
                if checksums:
                    cols["q_sum"] = qsum_out
                    cols["q_l1"] = ql1_out
                yield pd.DataFrame(cols)

        return df.select(id_col, vec_col).mapInPandas(quantize, out_schema)
    if impl != "jvm":
        raise ValueError(f"impl must be 'arrow' or 'jvm', got {impl!r}")
    vec = F.col(vec_col)
    max_abs = F.aggregate(
        vec, F.lit(0.0).cast("double"), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    # nullif wraps the QUOTIENT, not max_abs: a subnormal max_abs
    # (< ~3.2e-321) divided by qmax underflows to exactly 0.0, and a
    # 0.0 scale reaching the transform's division is DIVIDE_BY_ZERO
    # under ANSI mode (and garbage zeros otherwise) — the quotient
    # form NULL-marks both the zero-vector and the underflow class
    scale = F.when(
        ~F.isnan(max_abs) & (max_abs <= F.lit(_OVERFLOW)),
        F.nullif(max_abs / F.lit(float(qmax)), F.lit(0.0)),
    )
    qvec = F.when(
        scale.isNotNull(),
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("int")),
    )
    cols = [
        F.col(id_col),
        scale.alias("scale"),
        qvec.alias("qvec"),
    ]
    if checksums:
        zero = F.lit(0).cast("bigint")
        cols += [
            F.aggregate(qvec, zero, lambda a, x: a + x.cast("bigint")).alias("q_sum"),
            F.aggregate(qvec, zero, lambda a, x: a + F.abs(x.cast("bigint"))).alias("q_l1"),
        ]
    return df.select(*cols)
