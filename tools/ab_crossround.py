#!/usr/bin/env python
"""Pinned-code cross-round bench A/B (r9 verdict item 5).

Raw full-bank bench totals rose 74.5 -> 88.8 -> 99.3 s across rounds
7-9 while both calibration probes said "host epoch, not code". That
conclusion rested on calibration-adjusted inference; this harness
converts it into a measurement: check out the OLD round's stamp HEAD
in a worktree and alternate FULL-BANK bench runs old/new/old/new
inside one session, so host drift hits both codebases equally. The
pairwise-median total ratio is then a direct, same-epoch, code-only
number; per-query medians name any genuine regression.

Each bench child is `python bench.py` exactly as the driver runs it
(fresh subprocess, own SparkSession, both calib probes recorded in
its JSON line). BENCH_FULL.json written inside each checkout is
restored afterwards by the caller (git checkout).

Usage:
    python tools/ab_crossround.py LABEL_A:PATH_A LABEL_B:PATH_B \
        [--sf-dir=DIR] [--pairs=N] [--out=FILE]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_bench(path: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # a stale BENCH_FULL.json from an earlier run must never be read as
    # this run's result — remove it so a child that dies before writing
    # surfaces as a missing file, not a silently re-parsed old file
    full_path = os.path.join(path, "BENCH_FULL.json")
    if os.path.exists(full_path):
        os.remove(full_path)
    r = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, cwd=path, timeout=3600,
    )
    # returncode first: a bench that failed before writing the file
    # must raise the error carrying the child's stderr, not a
    # FileNotFoundError that masks it
    if r.returncode != 0:
        raise RuntimeError(f"bench at {path} failed:\n{r.stderr[-2000:]}")
    # bench.py prints the headline JSON to stdout and echoes the full
    # per-query line to stderr; the full line is also in BENCH_FULL.json
    return json.load(open(full_path))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    (la, pa), (lb, pb) = (tuple(a.split(":", 1)) for a in args[:2])
    sf_dir = opts.get("--sf-dir", "/root/testdata/sf0.1")
    pairs = int(opts.get("--pairs", "3"))
    out_path = opts.get("--out", "AB_r10_crossround.json")

    runs: dict[str, list[dict]] = {la: [], lb: []}
    for p in range(pairs):
        for label, path in ((la, pa), (lb, pb)):
            full = run_bench(path, sf_dir)
            runs[label].append(full)
            print(
                f"# pair {p} {label}: total={full['value']} "
                f"calib={full.get('calib_sec')} shuffle={full.get('calib_shuffle_sec')}",
                file=sys.stderr,
            )

    def med(xs):
        return statistics.median(xs)

    totals = {lab: [r["value"] for r in rs] for lab, rs in runs.items()}
    pair_ratios = [
        round(runs[lb][i]["value"] / runs[la][i]["value"], 3) for i in range(pairs)
    ]
    # per-query medians over the queries present in BOTH codebases
    common = set(runs[la][0]["queries"]) & set(runs[lb][0]["queries"])
    per_query = {}
    for q in sorted(common):
        a = med([r["queries"][q] for r in runs[la]])
        b = med([r["queries"][q] for r in runs[lb]])
        per_query[q] = {la: a, lb: b, "ratio": round(b / a, 3)}
    flagged = {
        q: v for q, v in per_query.items() if v["ratio"] > 1.1 and v[lb] - v[la] > 0.1
    }
    result = {
        "sf_dir": sf_dir,
        "pairs": pairs,
        "totals": totals,
        "total_medians": {la: med(totals[la]), lb: med(totals[lb])},
        "pairwise_total_ratios": pair_ratios,
        "pairwise_median_total_ratio": round(med(pair_ratios), 3),
        "calib_sec": {lab: [r.get("calib_sec") for r in rs] for lab, rs in runs.items()},
        "calib_shuffle_sec": {
            lab: [r.get("calib_shuffle_sec") for r in rs] for lab, rs in runs.items()
        },
        "queries_flagged_over_1p1x_and_0p1s": flagged,
        "per_query": per_query,
    }
    json.dump(result, open(out_path, "w"), indent=1)
    print(json.dumps({k: result[k] for k in (
        "total_medians", "pairwise_total_ratios", "pairwise_median_total_ratio",
        "queries_flagged_over_1p1x_and_0p1s")}, indent=1))


if __name__ == "__main__":
    main()
