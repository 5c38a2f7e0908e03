"""Deliberate crash/concurrency battery for the filesystem catalog
(r12 verdict ask #4).

The r12 commit-count probe — a PERFORMANCE probe — incidentally found
two catalog CORRECTNESS bugs (the orphan-batch-dir wedge and
timestamp resolution into the expired region), which argues the
commit protocol deserves targeted fault injection rather than
incidental coverage. Each test here kills a writer (by raising inside
the commit sequence) at a specific window of
``LakehouseTable._commit``'s publish -> advance-ref -> log-append
ordering, or races real concurrent writers, and asserts the documented
recovery contract:

  data write      | crash -> orphan batch dir: state unchanged, later
                  |   commits never wedge (free-suffix naming, r12),
                  |   remove_orphan_files reclaims
  manifest publish| crash -> durable commit with a stale commit log /
                  |   branch ref: every lineage answer identical via
                  |   fallback, heals on rebuild / next commit
  ref advance     | crash -> dangling manifest: head serves the old
                  |   snapshot, no version collision for the next
                  |   writer, history() never shows the dangling commit
  log append      | (advisory) log one behind: answers identical,
                  |   rebuild_commit_log backfills

Complements test_tables.py's orphan-wedge / commit-log-fallback /
loud-conflict tests and test_transactions.py's multi-table
crash-recovery pair; the racing-writers test here uses REAL threads
with the retry loop a production writer runs on CommitFailedException.
"""

import os
import threading

import pytest

from spark_iceberg_schema_evolution_spark.tables import (
    CommitConflict,
    LakehouseCatalog,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


class SimulatedCrash(RuntimeError):
    pass


def _crash_once(monkeypatch, obj, method: str, before: bool = True):
    """Make ``obj.method`` raise SimulatedCrash on its next call only.
    ``before=True`` kills the writer before the step runs (the step's
    effect never lands); ``before=False`` kills it after (the effect
    lands, everything downstream of it doesn't)."""
    real = getattr(obj.__class__, method)
    state = {"armed": True}

    def wrapper(self, *a, **kw):
        if state["armed"]:
            state["armed"] = False
            if before:
                raise SimulatedCrash(method)
            real(self, *a, **kw)
            raise SimulatedCrash(method)
        return real(self, *a, **kw)

    monkeypatch.setattr(obj.__class__, method, wrapper)
    return state


def test_kill_between_data_write_and_manifest_publish(
    spark, catalog, monkeypatch
):
    """Crash window 1: the batch parquet is on disk, the manifest
    never published. The table must serve the pre-crash snapshot,
    later commits must not wedge on the orphan's name, and
    remove_orphan_files must reclaim exactly the orphan."""
    catalog.write_evolving(spark.range(3).toDF("id"), "db", "w1")
    t = catalog.table("db", "w1")
    _crash_once(monkeypatch, t, "_publish_manifest")
    with pytest.raises(SimulatedCrash):
        t.append(spark.range(3, 6).toDF("id"))
    # state unchanged; the orphan dir exists but is not live
    assert {r.id for r in t.read().collect()} == {0, 1, 2}
    live = {os.path.basename(b["path"]) for b in t._load().batches}
    orphans = set(os.listdir(t.data_dir)) - live
    assert orphans, "the killed writer should have left its batch dir"
    # the next writer is not wedged and the orphan is reclaimed
    t.append(spark.range(6, 9).toDF("id"))
    assert {r.id for r in t.read().collect()} == {0, 1, 2, 6, 7, 8}
    removed = t.remove_orphan_files(older_than_s=0)
    assert removed
    assert set(os.listdir(t.data_dir)) == {
        os.path.basename(b["path"]) for b in t._load().batches
    }
    assert {r.id for r in t.read().collect()} == {0, 1, 2, 6, 7, 8}


def test_kill_between_manifest_publish_and_log_append(
    spark, catalog, monkeypatch
):
    """Crash window 3 (verdict r12 'What's wrong' #3): the manifest
    renamed, the advisory commit_log.jsonl one entry behind. The
    commit IS durable (publish is the commit point); every lineage
    answer must be identical through the per-hop fallback, and
    rebuild_commit_log must backfill the missing line."""
    catalog.write_evolving(spark.range(2).toDF("id"), "db", "w3")
    t = catalog.table("db", "w3")
    t.append(spark.range(2, 4).toDF("id"))
    _crash_once(monkeypatch, t, "_append_commit_log")
    with pytest.raises(SimulatedCrash):
        t.append(spark.range(4, 6).toDF("id"))
    monkeypatch.undo()
    # durable: the crashed commit is the head and its rows are live
    assert {r.id for r in t.read().collect()} == set(range(6))
    assert len(t._commit_log()) == len(t._versions()) - 1
    # lineage answers identical through the fallback walk
    behind = t.history()
    assert [h["version"] for h in behind] == t._versions()
    head_ts = t._load().committed_at_us
    assert t.version_as_of_timestamp(head_ts) == t._versions()[-1]
    # heals: wholesale rebuild, or simply the next commit's append
    assert t.rebuild_commit_log() == len(t._versions())
    assert t.history() == behind
    t.append(spark.range(6, 7).toDF("id"))
    assert len(t._commit_log()) == len(t._versions())


def test_kill_between_publish_and_ref_advance_on_branch(
    spark, catalog, monkeypatch
):
    """Crash window 2, on a table WITH a refs file (branch heads are
    explicit): the manifest exists but no ref points at it — a
    dangling snapshot, exactly Iceberg's orphaned-metadata shape. The
    branch head must keep serving the pre-crash snapshot, history()
    must never surface the dangling commit, and the next writer must
    allocate a FRESH version (global max), never colliding with it."""
    catalog.write_evolving(spark.range(4).toDF("id"), "db", "w2")
    t = catalog.table("db", "w2")
    t.create_tag("v_zero")  # materializes the refs file
    head_before = t._load().version
    _crash_once(monkeypatch, t, "_advance_ref")
    with pytest.raises(SimulatedCrash):
        t.append(spark.range(4, 8).toDF("id"))
    monkeypatch.undo()
    # head unchanged; the dangling manifest is on disk
    assert t._load().version == head_before
    assert {r.id for r in t.read().collect()} == {0, 1, 2, 3}
    dangling = set(t._versions()) - {
        h["version"] for h in t.history()
    }
    assert dangling, "the crashed commit should be dangling"
    # next writer: fresh version above the dangling one, no conflict
    v = t.append(spark.range(8, 10).toDF("id"))
    assert v > max(dangling)
    assert {r.id for r in t.read().collect()} == {0, 1, 2, 3, 8, 9}
    assert set(dangling).isdisjoint(
        h["version"] for h in t.history()
    )


def test_racing_writers_converge_with_retry(spark, catalog):
    """Two REAL concurrent writers on one table, each running the
    production retry loop (catch CommitConflict -> re-plan -> retry).
    Every append must land exactly once — optimistic concurrency may
    serialize them in any order but can never lose one (the exclusive
    link makes the loser loud, never a silent lost update)."""
    catalog.write_evolving(
        spark.createDataFrame([(-1,)], ["id"]), "db", "race"
    )
    n_per, errors = 6, []

    def writer(wid: int):
        t = catalog.table("db", "race")  # own handle, like own process
        try:
            for i in range(n_per):
                val = wid * 1000 + i
                df = spark.createDataFrame([(val,)], ["id"])
                for _ in range(30):  # bounded retry loop
                    try:
                        t.append(df)
                        break
                    except CommitConflict:
                        continue  # stale plan: reload happens per call
                else:
                    raise AssertionError(f"append {val} never landed")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in (1, 2)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = catalog.table("db", "race")
    rows = [r.id for r in t.read().collect()]
    want = {-1} | {w * 1000 + i for w in (1, 2) for i in range(n_per)}
    assert sorted(rows) == sorted(want)  # exactly once, none lost
    # lineage is a single chain: every live commit has a unique parent
    hist = t.history()
    parents = [h["parent"] for h in hist if h["parent"] is not None]
    assert len(parents) == len(set(parents))
    # retry-loop losers may leave orphan batch dirs; reclaim is clean
    t.remove_orphan_files(older_than_s=0)
    assert sorted(r.id for r in t.read().collect()) == sorted(want)
