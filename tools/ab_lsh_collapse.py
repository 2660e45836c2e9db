#!/usr/bin/env python
"""Same-epoch A/B of dedup_embedding_lsh's collapse+cap staging.

The r8 rotation flipped the registered configuration to
``collapse_identical=True, max_bucket_size=256`` (the
giant-identical-cluster defense). The r8 cross-checkout A/B read
1.14x at sf0.1 with overlapping rep spreads — inconclusive. This
harness re-measures the flip as a CONFIG-level A/B inside ONE
checkout: both arms run the identical code and differ only in the two
keyword arguments, so checkout/layout confounds vanish and the ratio
isolates exactly the collapse stage's fixed cost (collapse window
behind its checkpoint + cap occupancy count).

Protocol (the r8 advisor's methodology catch applied): one fresh
subprocess per (arm, rep), interleaved OFF/ON so host drift hits both
arms equally; inside each subprocess one un-timed warm-up run
(parquet footers + codegen) then best-of-2 timed runs; BOTH host-epoch
calibration axes (bench.calibrate CPU fold + bench.calibrate_shuffle
exchange probe) recorded per subprocess; medians over ALL reps — no
post-hoc warm-up-rep exclusion, the in-process warm-up already covers
it.

Usage: python tools/ab_lsh_collapse.py [SF_DIR] [REPS]  (>= 5 reps)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from mozart_etl_spark import querybank  # noqa: F401 (registry import path check)
from mozart_etl_spark.operators import similarity as sim_ops
from mozart_etl_spark.io import table
from mozart_etl_spark.querybank.llmops import _EMBEDDING_DIM
from mozart_etl_spark.session import get_spark
from pyspark.sql import functions as F
from bench import calibrate, calibrate_shuffle

sf_dir, arm = sys.argv[2], sys.argv[3]
spark = get_spark(app_name=f"ab-lsh-{arm}")
spark.sparkContext.setLogLevel("ERROR")

def run():
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: (x * F.lit(0.5)).cast("float")).alias("embedding"),
    )
    kw = dict(collapse_identical=True, max_bucket_size=256) if arm == "on" else dict(
        collapse_identical=False, max_bucket_size=None)
    return len(
        sim_ops.lsh_near_dup_pairs(
            emb.unionByName(twins), dim=_EMBEDDING_DIM, id_col="vec_id",
            vec_col="embedding", threshold=0.95, n_planes="auto", **kw,
        ).collect()
    )

n_warm = run()  # warm-up: footers + codegen, off the clock
best, rows = None, n_warm
for _ in range(2):
    t0 = time.perf_counter()
    rows = run()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
out = {"sec": round(best, 3), "rows": rows,
       "calib_sec": calibrate(spark), "calib_shuffle_sec": calibrate_shuffle(spark)}
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_child(repo: str, sf_dir: str, arm: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, arm],
        capture_output=True, text=True, cwd=repo, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(f"child ({arm}) failed:\n{r.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arms: dict[str, list[dict]] = {"off": [], "on": []}
    for rep in range(reps):
        for arm in ("off", "on"):  # interleaved OFF/ON
            res = run_child(repo, sf_dir, arm)
            arms[arm].append(res)
            print(f"# rep {rep} {arm}: {res}", file=sys.stderr)

    def med(key, arm):
        return round(statistics.median(r[key] for r in arms[arm]), 3)

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "protocol": "config-level A/B, one checkout; fresh subprocess per "
        "(arm, rep), interleaved; in-process warm-up then best-of-2; medians "
        "over ALL reps (no warm-up-rep exclusion)",
        "off": {"secs": [r["sec"] for r in arms["off"]], "rows": arms["off"][0]["rows"],
                "median_sec": med("sec", "off"),
                "median_calib_sec": med("calib_sec", "off"),
                "median_calib_shuffle_sec": med("calib_shuffle_sec", "off")},
        "on": {"secs": [r["sec"] for r in arms["on"]], "rows": arms["on"][0]["rows"],
               "median_sec": med("sec", "on"),
               "median_calib_sec": med("calib_sec", "on"),
               "median_calib_shuffle_sec": med("calib_shuffle_sec", "on")},
    }
    out["ratio_on_over_off"] = round(out["on"]["median_sec"] / out["off"]["median_sec"], 3)
    out["calib_ratio"] = round(
        out["on"]["median_calib_sec"] / out["off"]["median_calib_sec"], 3
    )
    out["calib_shuffle_ratio"] = round(
        out["on"]["median_calib_shuffle_sec"] / out["off"]["median_calib_shuffle_sec"], 3
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
