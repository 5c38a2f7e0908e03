"""SCD Type-2 (slowly-changing dimension) history maintenance.

North-star extension (the reference's MERGE overwrites in place — R-series
has no history-preserving variant): apply a batch of keyed changes to a
versioned dimension, closing the previously-current row per key and
opening a new one, Kimball-style.

Scale shape:
- CLOSED history rows pass through untouched (no shuffle, no rewrite) —
  at 100 TB the closed set is the overwhelming majority of the table.
- OPEN rows of UNCHANGED keys pass through via one anti-join against the
  (small) distinct changed-key set.
- Only open-rows-of-changed-keys + the change batch shuffle: one window
  over (keys, valid_from) rebuilds the validity chain — multiple changes
  to one key in a single batch chain correctly (each closes the previous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    keys: list[str],
    change_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Return the new history: ``history`` (columns = keys + attributes +
    ``valid_from``/``valid_to``/``is_current``) with ``changes`` (columns =
    keys + attributes + ``change_ts``) applied as type-2 updates.

    Every change row becomes a history row valid from its ``change_ts``;
    the previously-current row of that key is closed at that timestamp.
    Change rows are applied as given (no-op changes also version — filter
    upstream if unwanted). A brand-new key inserts as current.
    """
    attr_cols = [
        c
        for c in history.columns
        if c not in keys and c not in (valid_from, valid_to, is_current)
    ]
    missing = [c for c in keys + attr_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing columns: {missing}")

    closed = history.where(~F.col(is_current))
    open_rows = history.where(F.col(is_current)).select(
        *keys, *attr_cols, valid_from
    )
    changed_keys = changes.select(*keys).distinct()

    untouched = open_rows.join(changed_keys, keys, "left_anti").select(
        *keys,
        *attr_cols,
        F.col(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )

    to_rebuild = open_rows.join(changed_keys, keys, "left_semi").unionByName(
        changes.select(
            *keys, *attr_cols, F.col(change_ts).alias(valid_from)
        )
    )
    w = W.partitionBy(*keys).orderBy(valid_from)
    rebuilt = (
        to_rebuild.withColumn(valid_to, F.lead(valid_from).over(w))
        .withColumn(is_current, F.col(valid_to).isNull())
        .select(*keys, *attr_cols, valid_from, valid_to, is_current)
    )

    out_cols = [*keys, *attr_cols, valid_from, valid_to, is_current]
    return (
        closed.select(*out_cols)
        .unionByName(untouched.select(*out_cols))
        .unionByName(rebuilt)
    )
