"""Large-scale data-pipeline operators (beyond the reference surface).

- ``dedup``       exact / n-gram Jaccard / MinHash-LSH / SimHash /
                  repeated-span discovery+removal / novelty filter /
                  connected components
- ``text``        token stats, quality scoring, language-ID, fingerprints
- ``similarity``  embedding cosine KNN (brute-force + LSH-bucketed)
- ``multimodal``  binary-column plumbing with stubbed decoders
- ``corpus``      sampling, chunking, packing, caps, skew tooling,
                  distributed prefix sums / row numbering
- ``quality``     column profiling, referential-integrity audits
- ``events``      N-stage funnels, backward-inclusive as-of joins

All operators are pure DataFrame -> DataFrame transformers: no driver
collects, no Python row UDFs anywhere, shuffle keys chosen to stay
balanced at 100 TB. Relational work is JVM expressions; the dense
numeric folds (MinHash/SimHash signatures, LSH hyperplane projection)
default to vectorized numpy kernels behind Arrow ``mapInPandas``
(3-5x faster; the integer MinHash/SimHash folds are bit-identical to
the JVM path, the float LSH projection is sign-stable in practice
and recall-pinned — see ``lsh_banded``) with the pure-JVM fold
selectable per
call (``impl="jvm"``) or fleet-wide via ``SPARK_GRAFT_FOLD_IMPL=jvm``
for clusters that cannot run Python workers.
"""

from __future__ import annotations

import os


def default_fold_impl() -> str:
    """Implementation for the vectorized numeric folds: ``"arrow"``
    (numpy kernel behind mapInPandas — the measured-faster default)
    or ``"jvm"`` (pure higher-order-function expressions; no Python
    workers needed). ``SPARK_GRAFT_FOLD_IMPL`` overrides fleet-wide."""
    impl = os.environ.get("SPARK_GRAFT_FOLD_IMPL", "arrow")
    if impl not in ("arrow", "jvm"):
        raise ValueError(f"SPARK_GRAFT_FOLD_IMPL must be 'arrow' or 'jvm', got {impl!r}")
    return impl
