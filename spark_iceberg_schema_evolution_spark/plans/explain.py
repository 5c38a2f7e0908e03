"""Physical-plan inspection helpers.

The engine writes zero custom optimizer rules (SURVEY §4.2: Catalyst +
AQE provide pushdown, pruning, join selection, partial aggregation) — but
it must PROVE those kick in. These helpers expose the plan as text so
tests and audits can assert:

- filters reached the parquet scan (``PushedFilters``),
- scans read only needed columns (``ReadSchema``),
- small dimensions broadcast (``BroadcastHashJoin``),
- shuffle counts stay at the theoretical minimum (``Exchange``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The physical plan (pre-execution; AQE may re-plan at runtime, but
    static properties — pushdown, pruning, join strategy, exchange count —
    are visible here)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    # explainString(String) is not py4j-callable in this build; capture
    # df.explain's stdout instead.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle boundaries in the static plan (each is a full network
    redistribution at cluster scale — the scarcest resource)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", physical_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Two-phase (map-side partial + final) hash aggregation."""
    plan = physical_plan(df)
    return len(re.findall(r"HashAggregate", plan)) >= 2


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))
