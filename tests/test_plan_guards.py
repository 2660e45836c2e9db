"""Plan-shape regression guards over the whole query bank.

Every registered (non-streaming, non-iterative) query's physical plan
is asserted free of the two patterns that hard-fail at 100 TB:

- ``CartesianProduct`` — a non-broadcast cross product scales as
  |L|x|R|. (BroadcastNestedLoopJoin of a 1-row/centroid-sized frame is
  the intended pattern for scalar joins and stays allowed.)
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the data path.
  Arrow-batched Python (``ArrowEvalPython`` / ``mapInPandas``
  / ``FlatMapGroupsInPandas``) remains allowed: that is the documented
  escape hatch.

Streaming queries execute on build (drain) and iterative queries run
jobs while planning, so they are guarded by their own tests instead.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from mozart_etl_spark.querybank import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.001"

GUARDED = sorted(
    name
    for name, spec in REGISTRY.items()
    if "streaming" not in spec.tags and "iterative" not in spec.tags
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", GUARDED)
def test_no_scale_killers_in_plan(spark, name):
    plan = _plan(REGISTRY[name].fn(spark, SF))
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
