"""Schema-evolution operator family.

The reference's central capability (its value is *not* a query engine but
this family): compare, align, coerce, order and pad DataFrame schemas so
ragged batches can be unioned and appended to a live table whose schema
evolves. Re-expressed as pure DataFrame -> DataFrame functions, each a
single ``select`` (the reference's ``withColumn`` loops,
`src/utils/spark/spark_utils.py:203-209,226-228`, build one plan node per
column and blow up the analyzer on wide schemas).

Casts use ``try_cast`` semantics (cast failure -> NULL) to preserve the
reference's pre-ANSI legacy-cast behavior under Spark 4's ANSI default.

Reference parity map:
- compare_schemas  <- spark_utils.py:60-79 (commented out in reference)
- align_schema     <- spark_utils.py:82-111
- coerce_to_types  <- spark_utils.py:195-210 (ensure_schema_types_match)
- order_and_pad    <- spark_utils.py:213-235 (ensure_iceberg_schema_order_and_types)
- normalize_names  <- src/jobs/job.py:65-72
- with_ingest_ts   <- src/jobs/job.py:75-81
- fill_defaults    <- src/jobs/job.py:88-101 (commented out in reference)
- union_evolving   <- src/jobs/job.py:54-59
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class SchemaDiff:
    """Result of comparing two schemas (reference spark_utils.py:60-79)."""

    missing_in_left: set[str] = field(default_factory=set)
    missing_in_right: set[str] = field(default_factory=set)
    type_conflicts: dict[str, tuple[T.DataType, T.DataType]] = field(
        default_factory=dict
    )

    @property
    def compatible(self) -> bool:
        return not self.type_conflicts

    @property
    def identical(self) -> bool:
        return (
            not self.missing_in_left
            and not self.missing_in_right
            and not self.type_conflicts
        )


def compare_schemas(left: T.StructType, right: T.StructType) -> SchemaDiff:
    """Pure StructType diff: fields missing on each side + common fields whose
    types differ. The primitive under align/coerce/pad; also what a
    production ingest logs as its evolution audit record."""
    lf = {f.name: f.dataType for f in left.fields}
    rf = {f.name: f.dataType for f in right.fields}
    return SchemaDiff(
        missing_in_left={n for n in rf if n not in lf},
        missing_in_right={n for n in lf if n not in rf},
        type_conflicts={
            n: (lf[n], rf[n]) for n in lf if n in rf and lf[n] != rf[n]
        },
    )


def _try_cast(col: Column, dt: T.DataType) -> Column:
    # Legacy-cast semantics (bad value -> NULL) under ANSI mode.
    return col.try_cast(dt)


def align_schema(
    df: DataFrame, target: T.StructType, keep_extras: bool = True
) -> DataFrame:
    """Project ``df`` onto ``target``: existing columns cast to the target
    type, missing columns added as typed NULLs, extra columns appended last
    (reference align_schema, spark_utils.py:82-111). One ``select``."""
    have = {f.name for f in df.schema.fields}
    cols: list[Column] = []
    for f in target.fields:
        if f.name in have:
            cols.append(_try_cast(F.col(f.name), f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_extras:
        tgt = {f.name for f in target.fields}
        cols += [F.col(f.name) for f in df.schema.fields if f.name not in tgt]
    return df.select(*cols)


def coerce_to_types(df: DataFrame, catalog_types: dict[str, T.DataType]) -> DataFrame:
    """Cast every df column present in the live catalog schema to the
    catalog's type; other columns pass through (reference
    ensure_schema_types_match, spark_utils.py:195-210 — minus its
    ``lit(df[field])`` bug at line 209 and its per-column withColumn loop)."""
    cols = [
        _try_cast(F.col(f.name), catalog_types[f.name]).alias(f.name)
        if f.name in catalog_types
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def order_and_pad(df: DataFrame, catalog: T.StructType) -> DataFrame:
    """Reorder to catalog column order, add typed NULLs for catalog fields
    missing in df, append non-catalog extras last — the ordering that makes
    table-format schema evolution append new columns (reference
    ensure_iceberg_schema_order_and_types, spark_utils.py:213-235)."""
    return align_schema(df, catalog, keep_extras=True)


# exact reference mapping (job.py:65-72): spaces and dashes become
# underscores, parens are stripped
_NAME_STRIP = {" ": "_", "-": "_", "(": "", ")": ""}


def normalize_names(df: DataFrame) -> DataFrame:
    """Lowercase, underscore ``' '``/``-``, and strip ``(``/``)`` from
    column names for catalog compatibility (reference job.py:65-72), plus
    the collision check the reference lacked: two source names normalizing
    to one is an error (the reference silently produced duplicate columns
    the table would then reject)."""
    new_names = []
    for c in df.columns:
        n = c.lower()
        for bad, rep in _NAME_STRIP.items():
            n = n.replace(bad, rep)
        new_names.append(n)
    dupes = {n for n in new_names if new_names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"column name collision after normalization: {sorted(dupes)}"
        )
    return df.toDF(*new_names)


def with_ingest_ts(
    df: DataFrame, ingest_ts: _dt.datetime, col_name: str = "created_at"
) -> DataFrame:
    """Add a constant ingest timestamp as the FIRST column (reference
    job.py:75-81). The timestamp is injected — the reference evaluated
    ``datetime.now()`` at plan-construction time (job.py:76), baking
    nondeterminism into data; callers here pass it explicitly."""
    return df.select(
        F.lit(ingest_ts).cast(T.TimestampType()).alias(col_name), "*"
    )


def fill_defaults(
    df: DataFrame,
    string_default: str = "Unknown",
    bool_default: bool = False,
    int_default: int = 0,
) -> DataFrame:
    """NULL-default fill per dtype bucket — the op the reference wrote and
    commented out (job.py:84-101): string -> 'Unknown', boolean -> False,
    int/bigint -> 0. One select of ``coalesce`` per column."""
    defaults: dict[str, Column] = {}
    for name, dtype in df.dtypes:
        if dtype == "string":
            defaults[name] = F.lit(string_default)
        elif dtype == "boolean":
            defaults[name] = F.lit(bool_default)
        elif dtype in ("int", "bigint", "smallint", "tinyint"):
            defaults[name] = F.lit(int_default)
    cols = [
        F.coalesce(F.col(c), defaults[c]).alias(c) if c in defaults else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def union_evolving(dfs: list[DataFrame], target: T.StructType | None = None) -> DataFrame:
    """Align a list of ragged DataFrames and union them by name.

    First-file-wins target schema when none is given (reference job.py:54:
    ``target_schema = dfs[0].schema``), then a fold of
    ``unionByName(allowMissingColumns=True)`` (job.py:58-59) — Catalyst
    flattens the fold into a single Union node."""
    if not dfs:
        raise ValueError("union_evolving: no input DataFrames")
    tgt = target or dfs[0].schema
    aligned = [align_schema(d, tgt, keep_extras=True) for d in dfs]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), aligned
    )
