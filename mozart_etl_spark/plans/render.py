"""Jinja-subset SQL model renderer.

Implements exactly the template surface the reference's models use
(every construct cited from a checked-in model):

- ``{{ config(materialized=…, schema=…, alias=…, tags=[…]) }}`` —
  model config header (``project_01__mart_item_master.sql:1-5``);
- ``{{ source('group', 'table') }}`` — raw-layer dependency
  (``project_01__stg_cfg_item_master.sql:20``);
- ``{{ ref('model') }}`` — model-to-model dependency
  (``project_01__mart_item_master.sql:16``);
- ``{{ var('name', 'default') }}`` — run-parameter splice
  (``project_01__stg_cfg_to_odv_item_master.sql:27``);
- ``{% if var('x') %} … {% endif %}`` — template-time predicate
  elision (``project_01__stg_cfg_item_master.sql:21-23``).

Beyond the reference's 4-function subset, the renderer supports dbt's
incremental-model surface (``is_incremental()`` + ``{{ this }}``): the
reference's dbt stack ships it even though no checked-in model uses
it, and it is the idiom that turns a full-rebuild mart into a
delta-only merge at scale. ``is_incremental()`` is False on the
dependency pass and on first build, True when the runner re-renders
against an existing target; ``{{ this }}`` splices the fully-qualified
target table.

Rendering is two-phase: a **dependency pass** that records every
``source``/``ref`` call without resolving names (building the DAG),
then a **resolution pass** that splices fully-qualified Spark table
identifiers. Run parameters behave like dbt vars: ``var('x')`` with no
default raises if ``x`` is absent; with a default it substitutes.

Trino→Spark dialect notes: ``x::TYPE`` and ``||`` are valid Spark SQL
(4.x) and pass through unrewritten; bare ``VARCHAR`` (length-free, the
Trino/Postgres idiom in every reference mart, e.g.
``project_01__mart_item_master.sql:9-13``) is normalized to ``STRING``
because Spark's parser demands a length; ``CURRENT_TIMESTAMP`` is
rewritten to a fixed literal when a frozen clock is configured
(SURVEY.md §5 determinism rule).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import jinja2


@dataclass
class RenderedModel:
    name: str
    sql: str
    config: dict[str, Any] = field(default_factory=dict)
    sources: tuple[tuple[str, str], ...] = ()
    refs: tuple[str, ...] = ()

    @property
    def schema(self) -> str:
        return self.config.get("schema", "")

    @property
    def alias(self) -> str:
        return self.config.get("alias", self.name)

    @property
    def materialized(self) -> str:
        return self.config.get("materialized", "table")


class _VarUndefined(KeyError):
    pass


def _jinja_env() -> jinja2.Environment:
    return jinja2.Environment(
        undefined=jinja2.StrictUndefined,
        keep_trailing_newline=True,
    )


#: every wall-clock form the Trino surface exposes that the frozen
#: clock must pin: CURRENT_TIMESTAMP, CURRENT_TIMESTAMP(),
#: CURRENT_TIMESTAMP(p) with a precision argument, and the now()
#: alias — any case, optional whitespace inside the parens. The
#: precision is swallowed (a frozen literal has fixed precision).
_CLOCK_PATTERN = re.compile(
    r"\bCURRENT_TIMESTAMP\b(?:\s*\(\s*\d*\s*\))?|\bNOW\s*\(\s*\)", re.IGNORECASE
)
#: bare VARCHAR (no length) -> STRING; VARCHAR(n) stays as-is
_VARCHAR_PATTERN = re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE)

#: single-quoted SQL string literal, '' used as the escape
_QUOTED_SPAN = re.compile(r"'(?:[^']|'')*'")


def _rewrite_outside_literals(sql: str, fn: Callable[[str], str]) -> str:
    """Apply a textual rewrite only OUTSIDE single-quoted string
    literals — dialect normalization must never mutate data values
    (a literal ``'stored as VARCHAR'`` or ``'CURRENT_TIMESTAMP'``
    is output, not syntax)."""
    out, last = [], 0
    for m in _QUOTED_SPAN.finditer(sql):
        out.append(fn(sql[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(fn(sql[last:]))
    return "".join(out)


def render_sql(
    text: str,
    variables: dict[str, Any] | None = None,
    resolve_source: Callable[[str, str], str] | None = None,
    resolve_ref: Callable[[str], str] | None = None,
    frozen_clock: str | None = None,
    is_incremental: bool = False,
    this: str = "this",
) -> RenderedModel:
    """Render one model's text. Returns SQL + config + dependencies."""
    variables = variables or {}
    cfg: dict[str, Any] = {}
    sources: list[tuple[str, str]] = []
    refs: list[str] = []

    def config(**kwargs: Any) -> str:
        cfg.update(kwargs)
        return ""

    def source(group: str, tbl: str) -> str:
        dep = (group, tbl)
        if dep not in sources:
            sources.append(dep)
        if resolve_source is not None:
            return resolve_source(group, tbl)
        return f"{group}.{tbl}"

    def ref(model: str) -> str:
        if model not in refs:
            refs.append(model)
        if resolve_ref is not None:
            return resolve_ref(model)
        return model

    _MISSING = object()

    def var(name: str, default: Any = _MISSING) -> Any:
        if name in variables:
            return variables[name]
        if default is _MISSING:
            raise _VarUndefined(f"var({name!r}) has no value and no default")
        return default

    env = _jinja_env()
    rendered = env.from_string(text).render(
        config=config,
        source=source,
        ref=ref,
        var=var,
        is_incremental=lambda: is_incremental,
        this=this,
    )
    rendered = _rewrite_outside_literals(
        rendered, lambda seg: _VARCHAR_PATTERN.sub("STRING", seg)
    )
    if frozen_clock is not None:
        rendered = _rewrite_outside_literals(
            rendered, lambda seg: _CLOCK_PATTERN.sub(f"TIMESTAMP '{frozen_clock}'", seg)
        )
    # strip blank lines left by the config() header — but never blank
    # lines INSIDE a multi-line string literal, which are data
    spans = [(m.start(), m.end()) for m in _QUOTED_SPAN.finditer(rendered)]

    def _in_literal(pos: int) -> bool:
        return any(s <= pos < e for s, e in spans)

    kept, pos = [], 0
    for line in rendered.splitlines(keepends=True):
        if line.strip() or _in_literal(pos):
            kept.append(line)
        pos += len(line)
    sql = "".join(kept).strip()
    return RenderedModel(name="", sql=sql, config=cfg, sources=tuple(sources), refs=tuple(refs))


def render_model(
    path: str,
    variables: dict[str, Any] | None = None,
    resolve_source: Callable[[str, str], str] | None = None,
    resolve_ref: Callable[[str], str] | None = None,
    frozen_clock: str | None = None,
    is_incremental: bool = False,
    this: str = "this",
) -> RenderedModel:
    """Render a ``.sql`` model file; model name = file stem."""
    with open(path) as f:
        text = f.read()
    model = render_sql(
        text, variables, resolve_source, resolve_ref, frozen_clock, is_incremental, this
    )
    model.name = os.path.splitext(os.path.basename(path))[0]
    return model
