"""Driver-data assertions for the approximate llmops entries.

``dedup_embedding_lsh`` is rows-only at the driver (LSH candidate
generation is approximate, no SQL oracle), so its driver row proves
only that SOME pairs come back. This test pins WHICH pairs must come
back on the exact data the driver uses: the 20 deterministically
scaled twins the query injects (``vec_id + 100000`` with
``embedding * 0.5``) have cosine exactly 1 and collide in every LSH
table (halving flips no projection sign), so they are a
guaranteed-recall floor — the query must return all 20, at both the
smoke SF and the driver's correctness SF.
"""

from __future__ import annotations

import pytest

from mozart_etl_spark.querybank import REGISTRY, _ensure_loaded

from .conftest import SF_CORRECT, SF_SMOKE

_ensure_loaded()


@pytest.mark.parametrize("d", [SF_SMOKE, SF_CORRECT])
def test_embedding_lsh_driver_row_contains_injected_twins(spark, d):
    rows = REGISTRY["dedup_embedding_lsh"].fn(spark, d).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in rows}
    expected = {(i, i + 100000) for i in range(20)}
    missing = expected - set(pairs)
    assert not missing, f"injected twin pairs missing from LSH output: {missing}"
    for p in expected:
        assert pairs[p] == 1.0, f"twin pair {p} cosine {pairs[p]} != 1.0"
    # the driver's rows-only check is only meaningful if rows > 0 —
    # which the floor above already guarantees
    assert len(rows) >= 20
