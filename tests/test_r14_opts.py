"""Round-14 optimization-round pins.

Same discipline as tests/test_r13_opts.py: each pin holds one r14
change at the level that matters — exact-output equivalence for the
semantics-preserving rewrites, behavioral gates for the scale-safety
fixes (probe-gated DML, determinism-by-analysis replay provenance,
deduplicated merge broadcast keys, SCD2 broadcast bound).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.plans import explain
from spark_iceberg_schema_evolution_spark.tables import (
    LakehouseCatalog,
    LakehouseTable,
)


# --- VERDICT r13 #8: NOT MATCHED broadcast keys are deduplicated ------------


def test_merge_insert_broadcast_keys_distinct_on_dup_key_target(spark):
    """A duplicate-key target (legal when there is no update arm) must
    not inflate the NOT MATCHED probe's broadcast beyond source distinct
    keys — matched_keys is distinct'd before F.broadcast — and the
    insert arm's output must be identical to the unhinted plan's."""
    # 50 distinct keys, each duplicated 40x in the target
    tgt = (
        spark.range(0, 50)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .crossJoin(spark.range(40).select(F.lit(1).alias("__x")))
        .drop("__x")
    )
    src = spark.range(25, 75).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = LakehouseTable._apply_merge_clauses(
            tgt, src, tgt.schema, ["k"], None, None, None, True,
            source_broadcast=True,
        )
        unhinted = LakehouseTable._apply_merge_clauses(
            tgt, src, tgt.schema, ["k"], None, None, None, True,
            source_broadcast=False,
        )
        plan = explain.physical_plan(hinted)
        # the probe is still a broadcast anti-join (no shuffled target
        # keys), and its build side now carries a distinct aggregate
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert sorted(map(tuple, hinted.collect())) == sorted(
            map(tuple, unhinted.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# --- VERDICT r13 #6: replay provenance is determinism-by-analysis ----------


def test_dml_replay_refuses_nondeterministic_udf(spark, tmp_path):
    """A nondeterministic REGISTERED UDF in a DML predicate passes the
    regex denylist (it cannot know the name) but must be refused by the
    analysis gate: no dml provenance recorded, diff() takes the generic
    path and stays exact."""
    import random

    nd = F.udf(lambda: random.random(), "double").asNondeterministic()
    spark.udf.register("r14_nd_rand", nd)
    cat = LakehouseCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.table("db", "ndudf")
    rows = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0)], ["id", "amt"]
    )
    t.create(rows.schema)
    v1 = t.append(rows)
    # always true (rand in [0,1)), but nondeterministic BY ANALYSIS —
    # the denylist regex does not match "r14_nd_rand"
    v2 = t.delete_where("amt < 1000000 + r14_nd_rand()")
    assert t._load(v2).dml is None  # provenance refused
    d = {(r["id"], r["_change_type"]) for r in t.diff(v1, v2).collect()}
    assert d == {(1, "D"), (2, "D"), (3, "D")}
    # and a deterministic predicate still records provenance
    t2 = cat.table("db", "detp")
    t2.create(rows.schema)
    t2.append(rows)
    v3 = t2.delete_where("amt > 20.0")
    assert t2._load(v3).dml == {
        "op": "delete", "cond": "amt > 20.0", "months": None,
    }


def test_dml_replay_update_refuses_nondeterministic_udf_assignment(
    spark, tmp_path
):
    import random

    nd = F.udf(lambda: random.random(), "double").asNondeterministic()
    spark.udf.register("r14_nd_rand2", nd)
    cat = LakehouseCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.table("db", "ndupd")
    rows = spark.createDataFrame([(1, 5.0), (2, 15.0)], ["id", "amt"])
    t.create(rows.schema)
    t.append(rows)
    v2 = t.update_where(
        "amt > 10.0", {"amt": "amt + floor(r14_nd_rand2() * 0)"}
    )
    assert t._load(v2).dml is None


# --- VERDICT r13 #7: no-match unpartitioned DML must not write O(table) ----


def test_unpartitioned_nomatch_dml_above_gate_writes_nothing(
    spark, tmp_path, monkeypatch
):
    """Above DML_PROBE_ROWS a stats-inconclusive no-match DELETE/UPDATE
    runs a limit(1) existence probe and returns WITHOUT calling
    _write_batch — the O(table) discarded rewrite is the bug this
    bounds (VERDICT r13 'what's wrong #2')."""
    from spark_iceberg_schema_evolution_spark import tables as tables_mod

    cat = LakehouseCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.table("db", "gated")
    rows = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        ["id", "cat", "amt"],
    )
    t.create(rows.schema)
    v1 = t.append(rows)
    monkeypatch.setattr(tables_mod, "DML_PROBE_ROWS", 0)

    def boom(*a, **k):
        raise AssertionError("no-match DML above the gate must not write")

    with monkeypatch.context() as m:
        # 'ab' sorts between the 'a'/'b' footer min/max, so the stats
        # gate is inconclusive — the probe must prove the no-match
        m.setattr(LakehouseTable, "_write_batch", boom)
        assert t.delete_where("cat = 'ab'") == v1
        assert t.update_where("cat = 'ab'", {"amt": "amt + 1"}) == v1
    # did-match DML above the gate still rewrites correctly (the probe
    # early-exits and falls through to the normal path)
    v2 = t.delete_where("cat = 'b'")
    assert v2 == v1 + 1
    assert t.read().count() == 2
    v3 = t.update_where("cat = 'a'", {"amt": "amt + 5"})
    assert v3 == v2 + 1
    assert {r["amt"] for r in t.read().collect()} == {15.0, 35.0}


# --- r14: CC edge-dedup exchange elision is assertion-safe -----------------


def test_connected_components_pairs_distinct_equivalence(spark):
    """pairs_distinct=True must produce identical clusters — including
    under a MIS-assertion (duplicate pairs): min-label propagation is
    idempotent over duplicate messages, so the flag can only waste
    work, never change a label."""
    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        connected_components,
    )

    rows = [(1, 2), (2, 3), (5, 6), (8, 9), (1, 3)]
    clean = spark.createDataFrame(rows, ["id_a", "id_b"])
    dup = spark.createDataFrame(rows * 3, ["id_a", "id_b"])
    want = {
        (r["id"], r["cluster_id"])
        for r in connected_components(clean).collect()
    }
    for pairs in (clean, dup):
        got = {
            (r["id"], r["cluster_id"])
            for r in connected_components(
                pairs, pairs_distinct=True
            ).collect()
        }
        assert got == want


# --- ADVICE r13: SCD2 broadcast bound derives from first_ts's own frame ----


def test_scd2_broadcast_bound_uses_pre_hit_frame(spark, tmp_path):
    """An abnormal dimension (external writer: committed
    (keys, valid_from) with NO current row) makes `applied` undercount
    first_ts keys; the close-merge broadcast decision must bound from
    the pre-__hit frame's observed count instead."""
    from unittest import mock

    from spark_iceberg_schema_evolution_spark import tables as tables_mod
    from spark_iceberg_schema_evolution_spark.operators.scd import scd2_merge

    cat = LakehouseCatalog(spark, str(tmp_path))
    cat.create_namespace("db")
    t = cat.table("db", "dim")
    base = spark.createDataFrame(
        [(1, "x", 100)], ["k", "attr", "ts"]
    )
    scd2_merge(t, base, keys=["k"], change_ts="ts")
    # external writer leaves a committed-but-not-current tuple for a
    # key with NO current row: (k=9, valid_from=50, is_current=false)
    t.append(
        spark.createDataFrame(
            [(9, "z", 50, 60, False)],
            ["k", "attr", "valid_from", "valid_to", "is_current"],
        )
    )
    # replaying (9, 50): __hit=1 but __late=False (no current row), so
    # chained filters it (applied == 0) while first_ts still keys it
    changes = spark.createDataFrame([(9, "z", 50)], ["k", "attr", "ts"])
    captured = {}
    real = t.merge_into

    def spy(*a, **k):
        captured.update(k)
        return real(*a, **k)

    with mock.patch.object(
        tables_mod, "MERGE_BROADCAST_ROWS", 0
    ), mock.patch.object(t, "merge_into", spy):
        rep = scd2_merge(t, changes, keys=["k"], change_ts="ts")
    assert rep["applied"] == 0  # the undercounting quantity
    # bound from the pre-__hit frame (1 row) vs ceiling 0: no broadcast
    assert captured.get("source_broadcast") is False
