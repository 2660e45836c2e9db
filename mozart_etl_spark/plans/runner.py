"""Topological model execution against a SparkSession.

The Spark-first collapse of the reference's dbt-build step
(``_tenant_factory.py:361-392``): each model renders to one Spark SQL
statement whose ``source()``/``ref()`` calls resolve to fully
qualified catalog tables, executes distributed, and materializes with
``saveAsTable`` (the reference's ``+materialized: table`` CTAS,
``dbt_project.yml:14-25``). Run metadata per model — row count and a
5-row preview — mirrors ``_tenant_factory.py:373,385-390``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from .. import writers
from .graph import ModelGraph
from .render import render_model


@dataclass
class RunResult:
    model: str
    target: str
    num_rows: int
    preview: list[dict[str, Any]] = field(default_factory=list)


@dataclass
class ModelRunner:
    """Executes a model directory for one tenant.

    - ``source('raw', t)`` resolves to ``{raw_namespace}.t``;
    - ``ref(m)`` resolves to ``{mart_namespace}.{alias(m)}`` with the
      model's own ``schema`` config honored when present (the
      reference's pass-through schema macro,
      ``macros/generate_schema_name.sql:1-7``);
    - vars = ``{"tenant_id": …, **tenant.params, **run_vars}``
      (``_tenant_factory.py:364``).
    """

    spark: SparkSession
    models_dir: str
    raw_namespace: str
    mart_namespace: str
    variables: dict[str, Any] = field(default_factory=dict)
    frozen_clock: str | None = None
    collect_previews: bool = True

    def _resolve_source(self, group: str, tbl: str) -> str:
        # single-source tenants: every source group maps to the raw layer
        return f"{self.raw_namespace}.{tbl}"

    def _drop_conflicting(self, target: str, want: str) -> None:
        """Drop ``target`` only when it exists as the OTHER object
        kind: DROP TABLE on a view (and saveAsTable onto a view) is
        WRONG_COMMAND_FOR_OBJECT_TYPE, so materialization changes
        (table <-> view) must clear the old object first. Same-kind
        re-runs are left to CREATE OR REPLACE / overwrite."""
        try:
            existing = self.spark.catalog.getTable(target)
        except Exception:
            return
        kind = (existing.tableType or "").upper()
        if want == "view" and kind != "VIEW":
            self.spark.sql(f"DROP TABLE IF EXISTS {target}")
        elif want != "view" and kind == "VIEW":
            self.spark.sql(f"DROP VIEW IF EXISTS {target}")

    def _target_for(self, schema: str, alias: str) -> str:
        ns = schema or self.mart_namespace
        return f"{ns}.{alias}"

    def run(self, select: tuple[str, ...] | None = None) -> list[RunResult]:
        """Render + execute all models (or ``select``) in topo order."""
        graph = ModelGraph.from_dir(
            self.models_dir, variables=self.variables, frozen_clock=self.frozen_clock
        )
        # alias/schema lookup for ref() resolution
        targets = {
            name: self._target_for(m.schema, m.alias) for name, m in graph.models.items()
        }
        # two models resolving to one table silently overwrite each
        # other (last-in-topo-order wins) — fail like dbt's duplicate-
        # relation compilation error instead
        by_target: dict[str, str] = {}
        for name, target in targets.items():
            if target in by_target:
                raise ValueError(
                    f"models {by_target[target]!r} and {name!r} both "
                    f"materialize to {target!r}; give one a distinct "
                    "alias/schema"
                )
            by_target[target] = name

        def resolve_ref(model: str) -> str:
            if model not in targets:
                raise ValueError(f"ref() to unknown model {model!r}")
            return targets[model]

        for ns in {self.raw_namespace, self.mart_namespace} | {
            m.schema for m in graph.models.values() if m.schema
        }:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")

        results: list[RunResult] = []
        for name in graph.order:
            if select is not None and name not in select:
                continue
            target = targets[name]
            # dbt semantics: is_incremental() is True only when the model
            # is materialized 'incremental' AND the target already exists
            incremental_run = graph.models[
                name
            ].materialized == "incremental" and self.spark.catalog.tableExists(target)
            model = render_model(
                os.path.join(self.models_dir, f"{name}.sql"),
                variables=self.variables,
                resolve_source=self._resolve_source,
                resolve_ref=resolve_ref,
                frozen_clock=self.frozen_clock,
                is_incremental=incremental_run,
                this=target,
            )
            df = self.spark.sql(model.sql)
            self._drop_conflicting(target, model.materialized)
            if model.materialized == "view":
                self.spark.sql(f"CREATE OR REPLACE VIEW {target} AS {model.sql}")
            elif model.materialized == "incremental" and incremental_run:
                # delta-only: merge on unique_key when configured
                # (dbt's incremental+unique_key), plain append otherwise
                unique_key = model.config.get("unique_key")
                if unique_key:
                    keys = (unique_key,) if isinstance(unique_key, str) else tuple(unique_key)
                    writers.merge_upsert(self.spark, df, target, keys)
                else:
                    writers.append(self.spark, df, target)
            else:
                writers.full_replace(self.spark, df, target)
            out = self.spark.table(target)
            preview = (
                [row.asDict() for row in out.limit(5).collect()] if self.collect_previews else []
            )
            results.append(
                RunResult(model=name, target=target, num_rows=out.count(), preview=preview)
            )
        return results
