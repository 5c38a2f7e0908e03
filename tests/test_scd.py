"""SCD Type-2 operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.scd import scd2_apply


def _hist(spark, rows):
    return spark.createDataFrame(
        rows,
        "id BIGINT, seg STRING, valid_from STRING, valid_to STRING, "
        "is_current BOOLEAN",
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, ["id", "seg", "ts"])


def test_scd2_close_and_open(spark):
    hist = _hist(
        spark,
        [
            (1, "A", "2020-01-01", "2022-01-01", False),
            (1, "B", "2022-01-01", None, True),
            (2, "X", "2021-01-01", None, True),
        ],
    )
    ch = _changes(spark, [(1, "C", "2024-06-01")])
    out = scd2_apply(hist, ch, keys=["id"], change_ts="ts")
    rows = {
        (r.id, r.seg): (r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert rows[(1, "A")] == ("2020-01-01", "2022-01-01", False)  # closed kept
    assert rows[(1, "B")] == ("2022-01-01", "2024-06-01", False)  # now closed
    assert rows[(1, "C")] == ("2024-06-01", None, True)  # new current
    assert rows[(2, "X")] == ("2021-01-01", None, True)  # untouched
    assert out.count() == 4


def test_scd2_multiple_changes_chain(spark):
    hist = _hist(spark, [(1, "A", "2020-01-01", None, True)])
    ch = _changes(
        spark, [(1, "B", "2023-01-01"), (1, "C", "2024-01-01")]
    )
    out = scd2_apply(hist, ch, keys=["id"], change_ts="ts")
    rows = {
        (r.id, r.seg): (r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert rows[(1, "A")] == ("2020-01-01", "2023-01-01", False)
    assert rows[(1, "B")] == ("2023-01-01", "2024-01-01", False)
    assert rows[(1, "C")] == ("2024-01-01", None, True)


def test_scd2_new_key_inserts_current(spark):
    hist = _hist(spark, [(1, "A", "2020-01-01", None, True)])
    ch = _changes(spark, [(9, "Z", "2024-01-01")])
    out = scd2_apply(hist, ch, keys=["id"], change_ts="ts")
    rows = {(r.id, r.seg): r.is_current for r in out.collect()}
    assert rows[(9, "Z")] is True
    assert rows[(1, "A")] is True


def test_scd2_closed_rows_not_shuffled(spark):
    """Scale gate: closed history must not pass through the rebuild window
    — the plan's window operates only on open-changed + change rows."""
    from spark_iceberg_schema_evolution_spark.plans import explain

    hist = _hist(spark, [(1, "A", "2020-01-01", None, True)])
    ch = _changes(spark, [(1, "B", "2024-01-01")])
    out = scd2_apply(hist, ch, keys=["id"], change_ts="ts")
    plan = explain.physical_plan(out)
    assert plan.count("Window") == 1
