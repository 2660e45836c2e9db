#!/usr/bin/env python
"""Measure the documented scale knobs on the queries the sf1.0 stress
bench flagged as superlinear at their certified-default parameters.

The sf1.0 point (tools/scale_testdata.py) exposed growth the sf0.1
ceiling could not: with banding parameters FIXED, bucket/posting-list
occupancy grows linearly with the corpus and the within-bucket pair
expansion grows with its square. The engine already carries the knobs
for this — this tool measures them, same session, best-of-2 per
configuration, so the before/after is same-epoch evidence:

- `ngram_jaccard_pairs(max_df=...)`: drop shingles shared by more
  than max_df docs from candidate generation. Boilerplate shingles
  drive the quadratic term and carry no similarity signal; capped
  runs stop being exact (intersections count surviving shingles
  only), which is why the oracle-certified registry entries keep
  max_df=None.
- `connected_components` over the capped edge set (the pipeline the
  dedup_components / dedup_canonical queries run at scale).
- `lsh_near_dup_pairs(n_planes="auto")`: resolve (planes, tables)
  from corpus size + threshold via auto_lsh_params — constant bucket
  occupancy, recall target preserved with more tables.

Usage:
    python tools/scale_knobs.py /root/testdata/sf0.1 /tmp/sf1.0

Round log (r6, /tmp/sf1.0 = x10 key-shifted replication of sf0.1):
  see COVERAGE.md "sf1.0 stress point" for the recorded table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mozart_etl_spark.io import table
from mozart_etl_spark.operators import dedup as D
from mozart_etl_spark.operators import similarity as S
from mozart_etl_spark.session import get_spark

MAX_DF = 100


def timed(mk) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        n = mk().count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def lsh_input(spark, sf_dir: str):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: (x * F.lit(0.5)).cast("float")).alias(
            "embedding"
        ),
    )
    return emb.unionByName(twins)


def main(dirs: list[str]) -> None:
    spark = get_spark(app_name="mozart-etl-scale-knobs")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in dirs:
        docs = table(spark, sf_dir, "documents")
        jacc = lambda df=docs, **kw: D.ngram_jaccard_pairs(  # noqa: E731
            df, n=3, fingerprint=True, **kw
        ).filter(F.col("_raw_jaccard") >= 0.5)
        configs = {
            "jaccard_exact(max_df=None)": lambda: jacc(),
            f"jaccard_capped(max_df={MAX_DF})": lambda: jacc(max_df=MAX_DF),
            "components_exact": lambda: D.connected_components(
                jacc().select("doc_a", "doc_b")
            ),
            f"components_capped(max_df={MAX_DF})": lambda: D.connected_components(
                jacc(max_df=MAX_DF).select("doc_a", "doc_b")
            ),
            "lsh_pairs_fixed(6x6)": lambda: S.lsh_near_dup_pairs(
                lsh_input(spark, sf_dir), dim=64, threshold=0.95, n_planes=6, n_tables=6
            ),
            "lsh_pairs_auto": lambda: S.lsh_near_dup_pairs(
                lsh_input(spark, sf_dir), dim=64, threshold=0.95, n_planes="auto"
            ),
            # the at-scale near-dup GROUPING pipeline: MinHash-LSH
            # candidates -> exact Jaccard verification restricted to
            # candidates -> components. Cost follows candidate volume
            # (banding-bounded), not sum df^2 over the corpus. Since
            # r7 this IS the certified edge chain of dedup_components
            # / dedup_canonical — bands="auto" at threshold 0.5
            # resolves via minhash_lsh_params to (num_perm=90,
            # bands=30, r=3): miss probability (1-0.5^3)^30 ~= 1.8e-2,
            # i.e. recall 0.982 at exactly j=0.5 (and higher above
            # it); this knob table is what justified the flip.
            "pipeline_lsh_verify_components": lambda: D.connected_components(
                D.jaccard_verify_pairs(
                    docs,
                    D.minhash_lsh_pairs(docs, bands="auto", threshold=0.5)
                    .filter(F.col("est_jaccard") >= 0.35)
                    .select("doc_a", "doc_b"),
                )
                .filter(F.col("_raw_jaccard") >= 0.5)
                .select("doc_a", "doc_b")
            ),
        }
        only = os.environ.get("SPARK_GRAFT_KNOBS_ONLY")
        print(f"== {sf_dir}")
        for name, mk in configs.items():
            if only and only not in name:
                continue
            sec, n = timed(mk)
            print(f"  {sec:8.3f}s  {n:>9} rows  {name}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1.0"])
