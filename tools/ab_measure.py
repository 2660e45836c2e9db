#!/usr/bin/env python
"""Same-epoch A/B timing of selected queries between two repo
checkouts (e.g. the current HEAD and a git worktree at a previous
round's boundary commit).

Raw cross-round bench numbers on this shared host are incomparable —
the effective CPU speed swings ~1.5x between rounds (see
bench.calibrate). This harness answers "did the CODE get slower?" by
interleaving one fresh subprocess per (variant, rep) in A/B/A/B order
within a single session, so host drift affects both variants equally,
and by recording the calibration constant inside every subprocess so
residual drift is visible in the output.

Usage:
    python tools/ab_measure.py LABEL_A:PATH_A LABEL_B:PATH_B \
        query1 query2 ... [--sf-dir=DIR] [--reps=N]

(options take the ``--key=value`` form only; a bare ``--sf-dir DIR``
would be mis-read as a query name).

Prints one JSON object: per (variant, query) the per-rep best-of-2
times, the median across reps, per-rep calib_sec, and the B/A median
ratio per query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from mozart_etl_spark import querybank
from mozart_etl_spark.session import get_spark
sf_dir = sys.argv[2]
names = sys.argv[3].split(",")
spark = get_spark(app_name="ab-measure")
spark.sparkContext.setLogLevel("ERROR")
qs = querybank.queries()
out = {}
for name in names:
    # warm-up run: parquet footer cache + codegen, off the clock
    len(qs[name](spark, sf_dir).collect())
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        len(qs[name](spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
# the checkout's own bench.calibrate, so the host-epoch constant is
# by construction the same kernel bench.py records as calib_sec; a
# checkout predating calibrate() falls back to a local copy of the
# same fixed fold
try:
    from bench import calibrate
except ImportError:
    def calibrate(s):
        def once():
            t0 = time.perf_counter()
            s.range(0, 2_000_000_000, 1, 32).selectExpr("sum(id % 7)").collect()
            return time.perf_counter() - t0
        once()
        return round(min(once() for _ in range(3)), 3)
out["_calib"] = calibrate(spark)
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def run_child(path: str, sf_dir: str, names: list[str]) -> dict:
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, path, sf_dir, ",".join(names)],
        capture_output=True, text=True, env=env, cwd=path, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(f"child at {path} failed:\n{r.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    variants = [tuple(a.split(":", 1)) for a in args[:2]]
    names = args[2:]
    sf_dir = opts.get("--sf-dir", "/root/testdata/sf0.1")
    reps = int(opts.get("--reps", "3"))

    results: dict[str, list[dict]] = {label: [] for label, _ in variants}
    for rep in range(reps):
        for label, path in variants:  # interleaved: A B A B A B
            res = run_child(path, sf_dir, names)
            results[label].append(res)
            print(f"# rep {rep} {label}: {res}", file=sys.stderr)

    import statistics

    def med(xs):
        # true median (midpoint average for even rep counts — the
        # upper-middle element would let one slow rep skew the ratio)
        return statistics.median(xs)

    summary = {}
    (la, _), (lb, _) = variants
    for name in names + ["_calib"]:
        a = [r[name] for r in results[la]]
        b = [r[name] for r in results[lb]]
        summary[name] = {
            la: a, lb: b,
            f"median_{la}": med(a), f"median_{lb}": med(b),
            "ratio_b_over_a": round(med(b) / med(a), 3),
        }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": summary}, indent=1))


if __name__ == "__main__":
    main()
