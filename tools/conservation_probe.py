#!/usr/bin/env python
"""Conservation invariants at scale for the removal/rewrite operators.

The oracle gate certifies values at sf0.01; the failure mode it can't
see is SILENT ROW LOSS appearing only at scale (a partition dropped, a
join side lost, a window mis-keyed under real data volume). The r10
keep-list identity probe (dedup_canonical at sf1.0:
SUM(n_members) == corpus size exactly) is the model; this tool extends
it to every operator whose job is removing or rewriting rows (r10
verdict item 4). Each probe is an EXACT accounting identity — every
input row must land in exactly one output bucket — measured at the
synthetic sf1.0 decade (tools/scale_testdata.py), not asserted from
the plan:

- dedup_exact: SUM(n_copies) == |documents| (every document counted in
  exactly one fingerprint group, NULL-text group included) and one
  output row per distinct fingerprint.
- corpus_span_scrub: one output row per input document, and
  SUM(n_kept) + SUM(n_removed) == total corpus token count computed
  independently of the operator (token conservation: a cut token is
  reported removed, never vanished).
- corpus_decontaminate: the flagged set has no duplicate doc_ids, is a
  subset of the candidate universe (source <> 'src0'), and
  |flagged| + |candidates anti flagged| == |candidates| — the
  flag/clean split partitions the candidate corpus exactly.
- corpus_incremental_dedup: the batch partitions exactly into
  {novel} ∪ {dropped within-batch} ∪ {dropped against history}, each
  side computed INDEPENDENTLY of the operator (window replica for
  within-batch firsts, semi-join replica for history hits), and
  novel doc_ids are unique.

Usage:
    python tools/conservation_probe.py [SF_DIR]   # default /tmp/sf1.0

Build the sf1.0 decade first if missing:
    python tools/scale_testdata.py --src /root/testdata/sf0.1 --out /tmp/sf1.0
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mozart_etl_spark import querybank  # noqa: E402
from mozart_etl_spark.io import table  # noqa: E402
from mozart_etl_spark.operators.text import normalized_fp_col  # noqa: E402
from mozart_etl_spark.session import get_spark  # noqa: E402


def probe_dedup_exact(spark, sf_dir: str) -> dict:
    docs = table(spark, sf_dir, "documents")
    out = querybank.REGISTRY["dedup_exact"].fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_copies").alias("accounted"), F.count(F.lit(1)).alias("groups")
    ).collect()[0]
    n_docs = docs.count()
    n_fps = docs.select(F.md5("text")).distinct().count()
    return {
        "n_docs": n_docs,
        "sum_n_copies": agg["accounted"],
        "groups": agg["groups"],
        "distinct_fps": n_fps,
        "ok": agg["accounted"] == n_docs and agg["groups"] == n_fps,
    }


def probe_span_scrub(spark, sf_dir: str) -> dict:
    docs = table(spark, sf_dir, "documents")
    out = querybank.REGISTRY["corpus_span_scrub"].fn(spark, sf_dir)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct("doc_id").alias("ids"),
        F.sum(F.col("n_kept") + F.col("n_removed")).alias("accounted_tokens"),
    ).collect()[0]
    # the operator's row contract: one row per distinct non-NULL id
    # with >= 1 token; token conservation is over the SAME universe.
    # Recomputed here with raw SQL primitives, no operator code (same
    # tokenizer contract: trim + ASCII \s+ split, empty tokens out).
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    universe = (
        docs.filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.coalesce(F.array_size(toks), F.lit(0)).alias("_nt"))
        .filter(F.col("_nt") >= 1)
        .dropDuplicates(["doc_id"])
    )
    u = universe.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("_nt").alias("tokens")
    ).collect()[0]
    return {
        "n_docs_with_tokens": u["docs"],
        "rows_out": agg["rows"],
        "distinct_ids_out": agg["ids"],
        "accounted_tokens": agg["accounted_tokens"],
        "corpus_tokens": u["tokens"],
        "ok": agg["rows"] == u["docs"]
        and agg["ids"] == u["docs"]
        and agg["accounted_tokens"] == u["tokens"],
    }


def probe_decontaminate(spark, sf_dir: str) -> dict:
    docs = table(spark, sf_dir, "documents")
    flagged = querybank.REGISTRY["corpus_decontaminate"].fn(spark, sf_dir)
    cand = docs.filter(F.col("source") != "src0").select("doc_id")
    n_cand = cand.count()
    agg = flagged.agg(
        F.count(F.lit(1)).alias("rows"), F.count_distinct("doc_id").alias("ids")
    ).collect()[0]
    n_clean = cand.join(flagged.select("doc_id"), "doc_id", "left_anti").count()
    n_foreign = flagged.select("doc_id").join(cand, "doc_id", "left_anti").count()
    return {
        "n_candidates": n_cand,
        "n_flagged": agg["rows"],
        "flagged_distinct": agg["ids"],
        "n_clean": n_clean,
        "flagged_outside_universe": n_foreign,
        "ok": agg["rows"] == agg["ids"]
        and n_foreign == 0
        and agg["rows"] + n_clean == n_cand,
    }


def probe_incremental_dedup(spark, sf_dir: str) -> dict:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars", "text")
    # replicate the query's batch construction (querybank/corpus.py)
    history = docs.filter(F.col("doc_id") < 250)
    new_docs = docs.filter(F.col("doc_id") >= 250)
    replayed = history.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "lang", "n_chars", "text"
    )
    batch_copies = new_docs.filter(F.col("doc_id") < 255).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "lang", "n_chars", "text"
    )
    batch = new_docs.unionByName(replayed).unionByName(batch_copies)
    n_batch = batch.count()

    novel = querybank.REGISTRY["corpus_incremental_dedup"].fn(spark, sf_dir)
    agg = novel.agg(
        F.count(F.lit(1)).alias("rows"), F.count_distinct("doc_id").alias("ids")
    ).collect()[0]

    # independent accounting of the two drop paths (window + semi-join
    # replicas — no operator code)
    fp = normalized_fp_col(F.col("text"))
    batch_fp = batch.withColumn("_fp", fp)
    w = Window.partitionBy("_fp").orderBy("doc_id")
    firsts = batch_fp.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    n_dropped_within = n_batch - firsts.count()
    hist_fps = history.select(normalized_fp_col(F.col("text")).alias("_fp")).distinct()
    n_dropped_history = firsts.join(hist_fps, "_fp", "left_semi").count()
    return {
        "n_batch": n_batch,
        "n_novel": agg["rows"],
        "novel_distinct": agg["ids"],
        "n_dropped_within_batch": n_dropped_within,
        "n_dropped_against_history": n_dropped_history,
        "ok": agg["rows"] == agg["ids"]
        and agg["rows"] + n_dropped_within + n_dropped_history == n_batch,
    }


def probe_pack_sequences(spark, sf_dir: str) -> dict:
    """Token conservation for the packing rewrite (r12): every
    document lands in exactly one output row, and the packed token
    total equals a token count computed INDEPENDENTLY off the raw
    table — pack_sequences never truncates (documents longer than the
    budget still get an assignment; truncation policy is a downstream
    concern), so the accounting identity is exact equality with a
    zero truncation term."""
    docs = table(spark, sf_dir, "documents")
    out = querybank.REGISTRY["corpus_pack_sequences"].fn(spark, sf_dir)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct("doc_id").alias("ids"),
        F.sum("n_tokens").alias("tokens_packed"),
        F.min("seq_id").alias("min_seq"),
    ).collect()[0]
    n_docs = docs.count()
    # independent replica of the token accounting, straight off the
    # raw table (NULL text -> NULL count, skipped by SUM on both sides)
    tokens_in = docs.agg(
        F.sum(
            F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
        ).alias("t")
    ).collect()[0]["t"]
    return {
        "n_docs": n_docs,
        "rows": agg["rows"],
        "distinct_ids": agg["ids"],
        "tokens_in": tokens_in,
        "tokens_packed": agg["tokens_packed"],
        "min_seq": agg["min_seq"],
        "ok": (
            agg["rows"] == n_docs
            and agg["ids"] == n_docs
            and agg["tokens_packed"] == tokens_in
            and agg["min_seq"] == 0
        ),
    }


def probe_chunks_overlap(spark, sf_dir: str) -> dict:
    """Reassembly identity for the overlapping chunker (r12): for
    every document, stitching its chunks back together — each chunk
    contributes its first ``stride`` chars, the final chunk its whole
    text — must reproduce the source text EXACTLY (md5-compared), and
    a document yields chunks iff it has at least one character. Any
    dropped/duplicated/mis-windowed chunk breaks the stitch."""
    from mozart_etl_spark.querybank.corpus import _OV_STRIDE

    docs = table(spark, sf_dir, "documents")
    out = querybank.REGISTRY["corpus_chunks_overlap"].fn(spark, sf_dir)
    stitched = (
        out.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))).alias("cs"),
            F.max("chunk_id").alias("last"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            F.concat_ws(
                "",
                F.transform(
                    "cs",
                    lambda s: F.when(
                        s["chunk_id"] == F.col("last"), s["chunk_text"]
                    ).otherwise(s["chunk_text"].substr(F.lit(1), F.lit(_OV_STRIDE))),
                ),
            ).alias("rebuilt"),
        )
    )
    joined = docs.select("doc_id", "text").join(stitched, "doc_id", "left")
    agg = joined.agg(
        F.sum(
            F.when(
                (F.length("text") > 0) & (F.md5("rebuilt") != F.md5("text")), 1
            ).otherwise(0)
        ).alias("stitch_mismatches"),
        F.sum(
            F.when(
                # coalesce: NULL text must compare as "no chars", not
                # poison the inequality to NULL (which when() skips)
                F.coalesce(F.length("text") > 0, F.lit(False))
                != F.col("n_chunks").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("presence_mismatches"),
        F.sum(
            F.when(
                F.col("n_chunks").isNotNull()
                & (F.col("n_chunks") != F.ceil(F.length("text") / F.lit(float(_OV_STRIDE)))),
                1,
            ).otherwise(0)
        ).alias("count_mismatches"),
        F.count(F.lit(1)).alias("n_docs"),
    ).collect()[0]
    return {
        "n_docs": agg["n_docs"],
        "stitch_mismatches": agg["stitch_mismatches"],
        "presence_mismatches": agg["presence_mismatches"],
        "count_mismatches": agg["count_mismatches"],
        "ok": (
            agg["stitch_mismatches"] == 0
            and agg["presence_mismatches"] == 0
            and agg["count_mismatches"] == 0
        ),
    }


PROBES = {
    "dedup_exact": probe_dedup_exact,
    "corpus_span_scrub": probe_span_scrub,
    "corpus_decontaminate": probe_decontaminate,
    "corpus_incremental_dedup": probe_incremental_dedup,
    "corpus_pack_sequences": probe_pack_sequences,
    "corpus_chunks_overlap": probe_chunks_overlap,
}


def main(sf_dir: str) -> int:
    spark = get_spark(app_name="conservation-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    querybank._ensure_loaded()
    results: dict[str, dict] = {}
    for name, probe in PROBES.items():
        t0 = time.time()
        results[name] = probe(spark, sf_dir)
        results[name]["sec"] = round(time.time() - t0, 1)
    print(json.dumps({"sf_dir": sf_dir, "probes": results}))
    return 0 if all(r["ok"] for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"))
