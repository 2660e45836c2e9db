"""SQL model layer: Jinja-subset rendering, dependency DAG, runner.

This is the Spark-first replacement for the reference's dbt-trino
transform layer (``_tenant_factory.py:333-396``): models are plain
``.sql`` files using the four dbt template functions the reference
actually exercises — ``config`` / ``source`` / ``ref`` / ``var`` —
rendered with jinja2, wired into a dependency DAG, and executed
topologically as Spark SQL with table materialization.
"""

from .render import RenderedModel, render_model, render_sql
from .graph import ModelGraph
from .runner import ModelRunner, RunResult

__all__ = [
    "RenderedModel",
    "render_model",
    "render_sql",
    "ModelGraph",
    "ModelRunner",
    "RunResult",
]
