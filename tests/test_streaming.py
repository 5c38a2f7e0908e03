"""Streaming semantics tests: watermark late-data drop, stateful dedup
bounds, incremental equivalence (multi-batch == single-batch)."""

from __future__ import annotations

import datetime
import os
import time

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.streaming import windows as SW


def _write_events(spark, path, rows):
    """rows: (event_id, ts_string, user_id). Written as a SINGLE parquet
    file (pyarrow): the streaming file source lists plain files and does
    not descend into Spark's directory-style outputs."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, tss, uids = zip(*rows)
    to_ns = lambda s: int(  # noqa: E731
        datetime.datetime.fromisoformat(s)
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1_000_000
    ) * 1000
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([to_ns(t) for t in tss], pa.int64()),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        }
    )
    pq.write_table(table, path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: a row arriving
    (in a later file) far behind the advanced watermark must not resurrect
    its window."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 0: two on-time events, 2h apart -> watermark will advance to
    # 11:50 (watermark updates take effect at the NEXT batch)
    _write_events(
        spark,
        os.path.join(src, "f1.parquet"),
        [(1, "2024-01-01 10:00:00", 1), (2, "2024-01-01 12:00:00", 1)],
    )
    time.sleep(1.1)  # file-source ordering is mtime-based
    # batch 1: on-time event; runs with watermark 11:50 -> closes + emits
    # the 10:00 window
    _write_events(
        spark, os.path.join(src, "f2.parquet"), [(4, "2024-01-01 13:00:00", 1)]
    )
    time.sleep(1.1)
    # batch 2: a very late event for the already-closed 10:00 window
    _write_events(
        spark, os.path.join(src, "f3.parquet"), [(3, "2024-01-01 10:05:00", 1)]
    )

    stream = SW.events_file_stream(spark, src, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("start"), "n")
    )
    out = SW.run_to_memory(agg, "wm_sink", output_mode="append")
    rows = {r.start: r.n for r in out.collect()}
    # the 10:00 window emitted once with ONLY the on-time event; the late
    # row (event 3) was dropped, not re-emitted
    assert rows.get("10:00") == 1


def test_stream_dedup_bounds(spark):
    sf = "/root/testdata/sf0.001"
    ev = SW.read_events_stream(spark, sf, max_files_per_trigger=1)
    deduped = SW.dedup_within_watermark(ev, ["event_id"])
    out = SW.run_to_memory(deduped, "dd_sink", output_mode="append")
    n_in = spark.read.parquet(f"{sf}/events.parquet").count()
    n_out = out.count()
    n_distinct = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert n_distinct <= n_out <= n_in


def test_stateful_accumulator_survives_batches(spark, tmp_path):
    """applyInPandasWithState: per-user state must carry across
    micro-batches — two files, maxFilesPerTrigger=1, final update per user
    equals the all-data aggregate."""
    from spark_iceberg_schema_evolution_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events(
        spark,
        os.path.join(src, "f1.parquet"),
        [(1, "2024-01-01 10:00:00", 7), (2, "2024-01-01 10:01:00", 7)],
    )
    time.sleep(1.1)
    _write_events(
        spark,
        os.path.join(src, "f2.parquet"),
        [(3, "2024-01-01 10:02:00", 7), (4, "2024-01-01 10:03:00", 8)],
    )
    stream = SW.events_file_stream(spark, src, max_files_per_trigger=1)
    out = SW.run_to_memory(
        running_user_totals(stream), "state_sink", output_mode="update"
    )
    # memory sink in update mode appends every update row; the LAST row
    # per user is the final state
    rows = out.collect()
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.total_value)
    assert final[7] == (3, 3.0)  # 2 events batch 1 + 1 event batch 2
    assert final[8] == (1, 1.0)
    # state progressed across batches: user 7 must have an intermediate
    # update with n_events == 2
    assert any(r.user_id == 7 and r.n_events == 2 for r in rows)


def test_incremental_equals_batch(spark):
    """Tumbling counts computed incrementally must equal the one-shot batch
    aggregation (exactly-once accumulation across micro-batches)."""
    sf = "/root/testdata/sf0.001"
    ev = SW.read_events_stream(spark, sf, max_files_per_trigger=1)
    streamed = SW.run_to_memory(
        SW.tumbling_counts(ev), "inc_sink", output_mode="complete"
    )
    from spark_iceberg_schema_evolution_spark.queries import load_events

    batch = SW.tumbling_counts(load_events(spark, sf))
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_upsert_converges(spark, tmp_path):
    """Streaming MERGE sink: keys re-delivered across micro-batches end as
    ONE row each with the latest value (CDC upsert), not duplicates."""
    from spark_iceberg_schema_evolution_spark.streaming import windows as SW
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    from tests.conftest import SF_SMOKE
    ev = SW.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "value"
    )
    # one row per user per micro-batch -> merge on user_id
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )
    SW.stream_upsert_to_lakehouse(
        agg.select("user_id", "n", "last_ts"),
        cat,
        "db",
        "user_state",
        on=["user_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    t = cat.table("db", "user_state").read()
    users = t.groupBy("user_id").count().where("count > 1").count()
    assert users == 0  # upsert converged: one row per key
    assert t.count() == t.select("user_id").distinct().count()


def test_stream_upsert_dedupes_multirow_batches(spark, tmp_path):
    """A CDC micro-batch with MANY rows per key must converge last-wins
    (change_ts dedup), not insert duplicates (round-2 ADVICE)."""
    from spark_iceberg_schema_evolution_spark.queries import load_events
    from spark_iceberg_schema_evolution_spark.streaming import windows as SW
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog
    from tests.conftest import SF_SMOKE

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    ev = SW.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "value"
    )
    SW.stream_upsert_to_lakehouse(
        ev, cat, "db", "u", on=["user_id"],
        checkpoint_dir=str(tmp_path / "c1"),
        output_mode="append", change_ts="ts",
    )
    t = cat.table("db", "u").read()
    assert t.groupBy("user_id").count().where("count > 1").count() == 0
    # last-wins: the surviving ts is each user's max event ts
    mx = load_events(spark, SF_SMOKE).groupBy("user_id").agg(
        F.max("ts").alias("max_ts")
    )
    assert (
        t.join(mx, "user_id").where(F.col("ts") != F.col("max_ts")).count()
        == 0
    )


def test_stream_upsert_rejects_dup_keys_without_ts(spark, tmp_path):
    import pytest as _pytest

    from spark_iceberg_schema_evolution_spark.streaming import windows as SW
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog
    from tests.conftest import SF_SMOKE

    cat = LakehouseCatalog(spark, str(tmp_path / "wh2"))
    ev = SW.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "value"
    )
    with _pytest.raises(Exception, match="multiple rows per merge key"):
        SW.stream_upsert_to_lakehouse(
            ev, cat, "db", "u2", on=["user_id"],
            checkpoint_dir=str(tmp_path / "c2"),
            output_mode="append",
        )


def test_available_now_equals_batch(spark):
    """Trigger.AvailableNow drains the file source across micro-batches
    and terminates on its own; results must equal the one-shot batch
    aggregation."""
    from spark_iceberg_schema_evolution_spark.queries import load_events

    sf = "/root/testdata/sf0.001"
    ev = SW.read_events_stream(spark, sf, max_files_per_trigger=1)
    got = SW.run_available_now(
        SW.tumbling_counts(ev), "avnow_sink", output_mode="complete"
    )
    batch = SW.tumbling_counts(load_events(spark, sf))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_kafka_source_builder_wiring(spark):
    """The kafka-format reader is real config plumbing; the connector jar
    is absent in this image (README gate), so building the stream must
    fail with Spark's missing-data-source error — NOT a python error in
    our wiring. With the jar present the same call returns an events-shaped
    stream."""
    try:
        ev = SW.read_kafka_stream(
            spark, "broker:9092", "events", max_offsets_per_trigger=1000
        )
    except Exception as e:  # noqa: BLE001 — asserting the error class below
        msg = str(e)
        assert "kafka" in msg.lower() and (
            "Failed to find" in msg or "DATA_SOURCE" in msg.upper()
        )
    else:  # jar present: full contract
        assert ev.isStreaming
        assert ev.columns == [
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ]


def test_rate_source_shapes_events(spark):
    """The rate-source wrapper produces the events schema and real rows
    (unbounded source smoke: start, let a couple of batches fire, stop)."""
    ev = SW.read_rate_stream(spark, rows_per_second=500)
    q = (
        ev.writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_sink").count() > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    out = spark.table("rate_sink")
    assert out.columns == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    assert out.count() > 0
    assert out.where(
        ~F.col("event_type").isin("view", "click", "purchase")
    ).count() == 0


def test_kafka_event_decode_offline(spark):
    """The from_json value-decode path, tested without the connector jar:
    a valid payload round-trips, a malformed one surfaces as all-NULL
    columns (permissive mode), and the decoded frame is schema-IDENTICAL
    to EVENTS_SCHEMA — ts included (TimestampNTZ, not TimestampType) —
    so file/rate/Kafka sources stay interchangeable."""
    raw = spark.createDataFrame(
        [
            ('{"event_id": 7, "ts": "2024-03-01T10:30:00", '
             '"user_id": 42, "event_type": "click", "value": 1.5, '
             '"props": "{}"}',),
            ("this is not json",),
        ],
        ["value"],
    )
    out = SW.decode_event_payload(raw)
    assert out.schema == SW.EVENTS_SCHEMA
    rows = out.collect()
    good = next(r for r in rows if r.event_id is not None)
    assert (good.event_id, good.user_id, good.event_type, good.value) == (
        7, 42, "click", 1.5
    )
    assert good.ts.isoformat() == "2024-03-01T10:30:00"
    bad = next(r for r in rows if r.event_id is None)
    assert all(v is None for v in bad.asDict().values())


def test_stream_quality_gate_quarantines_bad_epochs(spark, tmp_path):
    """The gated sink commits only micro-batches that pass the
    expectations gate: file 1 is clean, file 2 carries a duplicate
    event_id — with maxFilesPerTrigger=1 the bad epoch is quarantined
    (no commit) and the table holds exactly the clean rows."""
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    src = str(tmp_path / "gate-src")
    os.makedirs(src)
    _write_events(
        spark,
        os.path.join(src, "f1.parquet"),
        [(1, "2024-01-01 10:00:00", 7), (2, "2024-01-01 10:01:00", 8)],
    )
    time.sleep(1.1)
    _write_events(
        spark,
        os.path.join(src, "f2.parquet"),
        [(3, "2024-01-01 10:02:00", 7), (3, "2024-01-01 10:03:00", 9)],
    )
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    stream = SW.events_file_stream(spark, src, max_files_per_trigger=1)
    report = SW.stream_to_lakehouse_gated(
        stream, cat, "db", "gated", str(tmp_path / "ckpt"),
        rules=[{"rule": "unique", "cols": ["event_id"]},
               {"rule": "not_null", "col": "user_id"}],
    )
    assert report["committed"] == 1
    assert len(report["skipped"]) == 1
    assert report["skipped"][0][1] == ["unique(event_id)"]
    out = cat.table("db", "gated").read()
    assert sorted(r.event_id for r in out.collect()) == [1, 2]
    # on_violation='fail' kills the stream instead
    import pytest as _pytest

    stream2 = SW.events_file_stream(spark, src, max_files_per_trigger=1)
    with _pytest.raises(Exception, match="failed quality gate"):
        SW.stream_to_lakehouse_gated(
            stream2, cat, "db", "gated2", str(tmp_path / "ckpt2"),
            rules=[{"rule": "unique", "cols": ["event_id"]}],
            on_violation="fail",
        )


def test_stream_upsert_with_continuous_rollup(spark, tmp_path):
    """The continuous-aggregate composition: the CDC upsert sink
    maintains a COUNT/SUM rollup incrementally per epoch, and the
    final rollup equals a from-scratch aggregate of the upserted
    table."""
    from spark_iceberg_schema_evolution_spark.streaming import windows as SW
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog
    from tests.conftest import SF_SMOKE

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    ev = SW.read_events_stream(spark, SF_SMOKE).select(
        "user_id", "ts", "value", (F.col("user_id") % 4).alias("cohort")
    )
    agg = ev.groupBy("user_id", "cohort").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )
    SW.stream_upsert_to_lakehouse(
        agg.select("user_id", "cohort", "n", "last_ts"),
        cat,
        "db",
        "user_state_r",
        on=["user_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        rollup_table="cohort_counts",
        rollup_group_cols=["cohort"],
        rollup_sum_cols=["n"],
    )
    state = cat.table("db", "user_state_r").read()
    rollup = {
        r.cohort: (r.n_rows, r.sum_n)
        for r in cat.table("db", "cohort_counts").read().collect()
    }
    expect = {
        r.cohort: (r.users, r.total_n)
        for r in state.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.sum("n").alias("total_n"),
        )
        .collect()
    }
    assert rollup == expect and rollup


def test_stream_upsert_max_batches_bounds_live_batches(spark, tmp_path):
    """r12 commit-count probe follow-up: every epoch appends one batch
    dir and the scan/merge plan carries one subtree per live batch
    (measured 39s -> 336s per MERGE from 200 -> 449 batches), so the
    sink self-maintains — max_batches triggers an inline scoped
    compaction, the live batch count stays bounded across epochs, the
    upserted state is unchanged, and the continuous rollup remains
    exact (the compaction commit is advanced over as a writer-asserted
    no-op, so the delta-hint fast path never desyncs)."""
    from spark_iceberg_schema_evolution_spark.streaming import windows as SW
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog
    from tests.conftest import SF_SMOKE

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    ev = SW.read_events_stream(
        spark, SF_SMOKE, max_files_per_trigger=1
    ).select(
        "user_id", "ts", "value", (F.col("user_id") % 4).alias("cohort")
    )
    agg = ev.groupBy("user_id", "cohort").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
    )
    SW.stream_upsert_to_lakehouse(
        agg.select("user_id", "cohort", "n", "last_ts"),
        cat,
        "db",
        "user_state_mb",
        on=["user_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        merge_mode="mor",  # the accumulating shape: one batch per epoch
        max_delete_files=4,
        max_batches=3,
        rollup_table="cohort_counts_mb",
        rollup_group_cols=["cohort"],
        rollup_sum_cols=["n"],
    )
    t = cat.table("db", "user_state_mb")
    snap = t._load()
    # bounded: compaction fires whenever the count exceeds the cap, so
    # the steady state is cap + the few epochs since the last trigger
    assert len(snap.batches) <= 4, len(snap.batches)
    state = t.read()
    assert state.groupBy("user_id").count().where("count > 1").count() == 0
    rollup = {
        r.cohort: (r.n_rows, r.sum_n)
        for r in cat.table("db", "cohort_counts_mb").read().collect()
    }
    expect = {
        r.cohort: (r.users, r.total_n)
        for r in state.groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("users"), F.sum("n").alias("total_n"))
        .collect()
    }
    assert rollup == expect and rollup


def test_stream_upsert_unpartitioned_bounded_fold_cycles(
    spark, tmp_path
):
    """r12 ask #5: on an UNPARTITIONED table, max_batches must fold
    only the smallest surplus batches (compact_batches) — bounded
    inline work per epoch, never a whole-table rewrite. 14 one-file
    epochs with a cap of 3 forces >= 3 fold cycles; the live batch
    and delete-file counts stay pinned at their caps across all of
    them and the upserted state is exactly last-wins."""
    import glob
    import shutil

    from spark_iceberg_schema_evolution_spark.streaming import windows as SW
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    src = str(tmp_path / "src")
    os.makedirs(src)
    n_epochs, keys_per = 14, 5
    for e in range(n_epochs):
        rows = [
            (
                float(e),
                datetime.datetime(2024, 1, 1, 0, e),
                (e * 2 + i) % 12,  # overlapping keys -> mor updates
            )
            for i in range(keys_per)
        ]
        df = spark.createDataFrame(
            rows, "value DOUBLE, ts TIMESTAMP, user_id LONG"
        ).coalesce(1)
        stage = str(tmp_path / "stage" / f"e{e}")
        df.write.mode("overwrite").parquet(stage)
        shutil.copy(
            glob.glob(f"{stage}/part-*.parquet")[0],
            os.path.join(src, f"epoch-{e:03d}.parquet"),
        )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    SW.stream_upsert_to_lakehouse(
        stream,
        cat,
        "db",
        "flat_state",
        on=["user_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        change_ts="ts",
        merge_mode="mor",
        max_delete_files=2,
        max_batches=3,
    )
    t = cat.table("db", "flat_state")
    snap = t._load()
    # pinned bounds: cap + at most the epochs since the last trigger
    assert len(snap.batches) <= 4, len(snap.batches)
    assert len(snap.deletes) <= 3, len(snap.deletes)
    # >= 3 fold cycles actually happened: count commits whose live
    # batch count DROPPED vs their parent (the fold signature)
    counts = {
        v: len(t._load(v).batches) for v in t._versions()
    }
    hist = t.history()
    folds = sum(
        1
        for h in hist
        if h["parent"] in counts
        and counts[h["version"]] < counts[h["parent"]]
    )
    assert folds >= 3, folds
    # exactness: last-wins per key over every epoch file
    batch = spark.read.parquet(src)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc())
    want = {
        (r.user_id, r.value, r.ts)
        for r in batch.withColumn(
            "__rn", F.row_number().over(w)
        ).where("__rn = 1").drop("__rn").collect()
    }
    got = {(r.user_id, r.value, r.ts) for r in t.read().collect()}
    assert got == want


def test_stream_dedup_ingest_epochs(spark, tmp_path):
    """Streaming corpus ingestion: epoch 1 seeds the corpus; epoch 2
    (one file per trigger) carries an exact dup, a near dup, and fresh
    content — only the fresh doc commits, the signature store tracks
    the corpus, and every epoch's dedup cost is O(epoch)."""
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    src = str(tmp_path / "ddsrc")
    os.makedirs(src)

    def write_docs(name, rows):
        spark.createDataFrame(
            rows, "doc_id LONG, text STRING, source STRING"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        import glob
        import shutil

        part = glob.glob(
            str(tmp_path / "stage" / name / "part-*.parquet")
        )[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    write_docs(
        "e1",
        [
            (
                i,
                f"stream seed doc {i} with plenty of body words "
                f"for stable shingles number {i}",
                "web",
            )
            for i in range(10)
        ],
    )
    time.sleep(1.1)
    write_docs(
        "e2",
        [
            (  # exact dup of seed 4
                100,
                "stream seed doc 4 with plenty of body words "
                "for stable shingles number 4",
                "web",
            ),
            (  # near dup of seed 6: one appended word
                101,
                "stream seed doc 6 with plenty of body words "
                "for stable shingles number 6 edited",
                "web",
            ),
            (102, "novel streaming material " + "z " * 30, "books"),
        ],
    )
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, source STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    report = SW.stream_dedup_ingest_to_lakehouse(
        stream, cat, "db", "corpus", str(tmp_path / "ck"),
        near_threshold=0.6,
    )
    assert report["rows_ingested"] == 11
    assert report["near_dropped"] == 1
    corpus = cat.table("db", "corpus").read()
    ids = sorted(r.doc_id for r in corpus.collect())
    assert ids == list(range(10)) + [102]
    assert cat.table("db", "corpus_sigs").row_count() == 11


def test_stream_scd2_sink(spark, tmp_path):
    """CDC stream -> SCD2 dimension: epoch 1 seeds keys, epoch 2
    changes one key (its open row closes, a new current opens) and
    carries a late change that is refused — O(batch) per epoch, never
    a dimension rebuild."""
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    src = str(tmp_path / "scdsrc")
    os.makedirs(src)

    def write_changes(name, rows):
        spark.createDataFrame(
            rows, "id LONG, seg STRING, ts STRING"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        import glob
        import shutil

        part = glob.glob(
            str(tmp_path / "stage" / name / "part-*.parquet")
        )[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    write_changes(
        "e1", [(1, "A", "2024-01-01"), (2, "X", "2024-01-15")]
    )
    time.sleep(1.1)
    write_changes(
        "e2",
        [(1, "B", "2024-02-01"), (2, "OLD", "2024-01-01")],  # late
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema("id LONG, seg STRING, ts STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    report = SW.stream_scd2_to_lakehouse(
        stream, cat, "db", "dim",
        checkpoint_dir=str(tmp_path / "ckpt"),
        keys=["id"], change_ts="ts",
    )
    assert report["rows_applied"] == 3
    assert report["late_dropped"] == 1
    assert report["replayed"] == 0  # never-committed row is not a replay
    rows = {
        (r.id, r.valid_from): (r.seg, r.is_current)
        for r in cat.table("db", "dim").read().collect()
    }
    assert rows[(1, "2024-01-01")] == ("A", False)
    assert rows[(1, "2024-02-01")] == ("B", True)
    assert rows[(2, "2024-01-15")] == ("X", True)


def test_stream_quantile_sketch_sink(spark, tmp_path):
    """Value stream -> lakehouse quantile sketch: two epochs append
    O(batch) bucket deltas; the coarsened stored sketch equals a
    one-shot sketch of all streamed rows and the p50 read obeys the
    relative-alpha bound against the exact median."""
    import glob
    import math
    import shutil

    from spark_iceberg_schema_evolution_spark.operators.profile import (
        quantile_sketch,
        quantile_sketch_coarsen,
        sketch_quantiles,
    )
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    src = str(tmp_path / "qsrc")
    os.makedirs(src)

    def drop(name, rows):
        spark.createDataFrame(rows, "g string, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / "stage" / name))
        part = glob.glob(
            str(tmp_path / "stage" / name / "part-*.parquet")
        )[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    vals1 = [float((i * 7) % 300 + 1) for i in range(250)]
    vals2 = [float((i * 13) % 900 + 1) for i in range(150)]
    drop("e1", [("s", v) for v in vals1])
    time.sleep(1.1)
    drop("e2", [("s", v) for v in vals2])

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    report = SW.stream_quantile_sketch_to_lakehouse(
        stream, cat, "db", "qsk", str(tmp_path / "ck"),
        group_cols=["g"], value_col="v", alpha=0.02,
    )
    assert report["committed_epochs"] == 2
    t = cat.table("db", "qsk")
    stored = quantile_sketch_coarsen(t.read(), ["g"])
    all_rows = spark.createDataFrame(
        [("s", v) for v in vals1 + vals2], "g string, v double"
    )
    direct = quantile_sketch(all_rows, ["g"], "v", alpha=0.02)
    assert {tuple(r) for r in stored.collect()} == {
        tuple(r) for r in direct.collect()
    }
    row = sketch_quantiles(stored, ["g"], [0.5], alpha=0.02).first()
    s = sorted(vals1 + vals2)
    exact = s[max(1, math.ceil(0.5 * len(s))) - 1]
    assert abs(row.quantile_est - exact) <= 0.02 * exact + 1e-12
    # alpha pinned: a drifted-alpha epoch would refuse (property check
    # lives in test_rollup; here just confirm the pin landed)
    assert t.properties()["sketch.alpha"] == "0.02"


def test_stream_upsert_replays_epoch_after_crash_mid_epoch(
    spark, tmp_path
):
    """Crash-mid-epoch discipline (r9 VERDICT ask #8): a failure AFTER
    the lakehouse MERGE commits but BEFORE the streaming checkpoint
    records the epoch replays that epoch on restart (offsets log has
    it, commits log doesn't — simulated here by deleting the epoch's
    commit marker, the exact on-disk state such a crash leaves). The
    replayed MERGE must be idempotent and the continuous rollup —
    which bookmarks SOURCE table versions, not stream epochs — must
    not double-count."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    src = str(tmp_path / "cdc_src")
    os.makedirs(src)

    def drop(name, rows):
        uid, ts, val = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uid, pa.int64()),
                    "ts": pa.array(ts, pa.int64()),
                    "value": pa.array(val, pa.float64()),
                }
            ),
            os.path.join(src, name),
        )
        time.sleep(1.1)  # file-source ordering is mtime-based

    stream = (
        spark.readStream.schema("user_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("cohort", F.col("user_id") % 2)
    )
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    def run():
        SW.stream_upsert_to_lakehouse(
            stream,
            cat,
            "db",
            "u_replay",
            on=["user_id"],
            checkpoint_dir=ckpt,
            output_mode="append",
            change_ts="ts",
            rollup_table="u_rollup",
            rollup_group_cols=["cohort"],
            rollup_sum_cols=["value"],
        )

    drop("f1.parquet", [(1, 10, 1.0), (2, 10, 2.0)])
    drop("f2.parquet", [(2, 20, 5.0), (3, 20, 3.0)])
    run()  # epochs 0 and 1 commit

    state = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in cat.table("db", "u_replay").read().collect()
    )
    rollup = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in cat.table("db", "u_rollup").read().collect()
    )
    s1, r1 = state(), rollup()
    assert len(s1) == 3  # users 1, 2 (last-wins 5.0), 3

    # crash mid-epoch: the LAST epoch's merge committed, its checkpoint
    # commit marker didn't. Structured Streaming's contract: offsets/N
    # present + commits/N absent -> batch N re-runs with the SAME data.
    commits = sorted(
        glob.glob(os.path.join(ckpt, "commits", "[0-9]*")),
        key=lambda p: int(os.path.basename(p)),
    )
    os.remove(commits[-1])
    # the local-fs checkpoint manager writes a Hadoop .N.crc sidecar
    # per commit marker; a crashed writer leaves neither, so drop it
    # too (keeping it would fail the replay's rename with
    # FileAlreadyExistsException instead of exercising recovery)
    crc = os.path.join(
        os.path.dirname(commits[-1]),
        f".{os.path.basename(commits[-1])}.crc",
    )
    if os.path.exists(crc):
        os.remove(crc)
    run()  # restart: replays the final epoch

    assert state() == s1  # MERGE idempotent under replay
    assert rollup() == r1  # rollup did not double-count

    # and the stream still makes progress after the recovery: the
    # rollup equals a from-scratch aggregate of the upserted table
    drop("f3.parquet", [(4, 30, 7.0)])
    run()
    assert len(state()) == 4
    expect = sorted(
        tuple(r)
        for r in cat.table("db", "u_replay")
        .read()
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    )
    assert rollup() == expect
    shutil.rmtree(src)
