"""Hidden bucket(n, col) partition transform: Murmur3 parity with
Spark's hash(), write-side layout, planning-time file pruning for
equality lookups, spec evolution soundness, and SQL routing.

The reference has no bucket transform; this is Iceberg's
``bucket(n, col)`` hidden partitioning re-expressed for the engine's
manifest — the point-lookup skip path that min/max footer stats
structurally cannot provide on hash-distributed keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_iceberg_schema_evolution_spark.hashing import (
    hash_bytes,
    spark_bucket,
    spark_hash,
)
from spark_iceberg_schema_evolution_spark.tables import (
    LakehouseCatalog,
    _parse_partition_spec,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


# -- Murmur3 parity -------------------------------------------------------


def test_murmur3_parity_with_spark_hash(spark):
    """The driver-side hasher must equal F.hash bit-for-bit, or pruning
    would silently drop live files. Boundary battery over all three
    bucketable types."""
    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31), 123456, -987654]
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 2**31, -(2**31) - 1, 10**15]
    strs = [
        "", "a", "ab", "abc", "abcd", "abcde", "hello world",
        "héllo", "日本語テキスト", "x" * 257, "\x00\x01\x7f", "emoji 🚀✨",
    ]
    rows = (
        [(i, None, None) for i in ints]
        + [(None, lv, None) for lv in longs]
        + [(None, None, s) for s in strs]
    )
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    got = spark.createDataFrame(rows, schema).select(
        "i", "l", "s",
        F.hash("i").alias("hi"),
        F.hash("l").alias("hl"),
        F.hash("s").alias("hs"),
    ).collect()
    for r in got:
        if r.i is not None:
            assert spark_hash(r.i, "int") == r.hi
        if r.l is not None:
            assert spark_hash(r.l, "bigint") == r.hl
        if r.s is not None:
            assert spark_hash(r.s, "string") == r.hs


def test_spark_hash_refuses_unhashable():
    # ambiguity -> None (= cannot prune), never a wrong bucket
    assert spark_hash(None, "int") is None
    assert spark_hash(True, "int") is None
    assert spark_hash(2**31, "int") is None  # int32 overflow
    assert spark_hash(1.5, "int") is None
    assert spark_hash(5, "string") is None
    assert spark_hash("x", "bigint") is None
    assert spark_hash(b"x", "string") is None
    assert spark_hash(7, "double") is None
    assert spark_bucket(None, "int", 16) is None


def test_hash_bytes_tail_is_spark_not_reference_murmur3():
    # Spark's tail mixes each byte through a full round; reference
    # MurmurHash3 accumulates the tail into one block. "abcde" (one
    # aligned block + one tail byte) distinguishes them: pin the value
    # so a "fix" toward textbook murmur3 fails loudly.
    assert hash_bytes(b"abcde") == spark_hash("abcde", "string")


# -- write layout + pruning ----------------------------------------------


def _mk_bucketed(catalog, n_rows=400, n_buckets=8):
    spark = catalog.spark
    df = spark.range(n_rows).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        F.concat(F.lit("cust-"), F.col("id")).alias("name"),
    )
    t = catalog.table("db", "b")
    catalog.create_namespace("db")
    t.create(df.schema, bucket_by=("id", n_buckets))
    t.append(df)
    return t, df


def test_bucket_write_layout_and_roundtrip(spark, catalog):
    t, df = _mk_bucketed(catalog)
    out = t.read()
    assert out.columns == ["id", "grp", "name"]  # hidden col dropped
    assert out.count() == 400
    # every data file sits in a __p_bucket=K dir
    snap = t._load()
    rels = list(snap.batches[0]["file_rows"])
    assert rels and all("__p_bucket=" in r for r in rels)
    assert snap.batches[0]["bucket_spec"] == ["id", 8, "bigint"]


def test_bucket_equality_prunes_to_one_file_per_batch(spark, catalog):
    t, df = _mk_bucketed(catalog)
    t.append(df.withColumn("id", F.col("id") + 1000))
    plan = t.plan_scan([("id", "=", 37)])
    assert plan["batches_scanned"] >= 1
    # 2 batches x 8 buckets of files total; equality hits exactly one
    # bucket per batch
    assert plan["files_total"] >= 16
    assert plan["files_scanned"] <= 2
    got = t.read_where([("id", "=", 37)]).collect()
    assert [(r.id, r.grp, r.name) for r in got] == [(37, 37 % 7, "cust-37")]
    # exhaustive: every key still found through the pruned path
    found = t.read_where([("id", "=", 1399)]).collect()
    assert [r.id for r in found] == [1399]


def test_bucket_pruning_equals_full_scan_for_all_keys(spark, catalog):
    t, _ = _mk_bucketed(catalog, n_rows=64, n_buckets=4)
    full = {r.id for r in t.read().collect()}
    for key in [0, 1, 17, 42, 63]:
        assert key in full
        got = t.read_where([("id", "=", key)]).collect()
        assert len(got) == 1 and got[0].id == key
    assert t.read_where([("id", "=", 9999)]).count() == 0


def test_string_bucket_column(spark, catalog):
    spark_ = catalog.spark
    df = spark_.range(100).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc"),
        F.col("id").alias("v"),
    )
    catalog.create_namespace("db")
    t = catalog.table("db", "s")
    t.create(df.schema, bucket_by=("doc", 16))
    t.append(df)
    plan = t.plan_scan([("doc", "=", "doc-55")])
    assert plan["files_scanned"] == 1
    assert plan["files_total"] > 1
    got = t.read_where([("doc", "=", "doc-55")]).collect()
    assert [(r.doc, r.v) for r in got] == [("doc-55", 55)]


def test_bucket_under_month_partitioning(spark, catalog):
    spark_ = catalog.spark
    df = spark_.range(200).select(
        F.col("id").alias("id"),
        F.expr(
            "timestamp'2024-01-15 00:00:00' + make_interval(0, id % 3)"
        ).alias("ts"),
    )
    catalog.create_namespace("db")
    t = catalog.table("db", "mb")
    t.create(df.schema, partition_month_of="ts", bucket_by=("id", 4))
    t.append(df)
    snap = t._load()
    b = snap.batches[0]
    assert len(b["months"]) == 3
    # nested layout: month dir above bucket dir
    rel = next(iter(b["file_rows"]))
    assert rel.replace("\\", "/").split("/")[0].startswith("__p_month=")
    assert "__p_bucket=" in rel
    # equality on the bucket key prunes within every month
    plan = t.plan_scan([("id", "=", 7)])
    assert plan["files_scanned"] <= 3  # <=1 file per month
    assert plan["files_total"] >= 12
    got = t.read_where([("id", "=", 7)]).collect()
    assert len(got) == 1 and got[0].id == 7
    # month pruning still composes
    assert t.read(months=["2024-02"]).count() == df.where(
        "month(ts) = 2"
    ).count()


def test_spec_evolution_old_batches_stay_correct(spark, catalog):
    """Enable bucketing mid-lifecycle: pre-spec batches carry no stamp
    (never bucket-pruned), post-spec batches prune — reads stay exact
    across the boundary, and a rewrite migrates the layout."""
    spark_ = catalog.spark
    df1 = spark_.range(100).select(F.col("id"), F.lit("old").alias("tag"))
    catalog.create_namespace("db")
    t = catalog.table("db", "ev")
    t.create(df1.schema)
    t.append(df1)
    t.set_bucket_spec("id", 8)
    t.append(
        spark_.range(100, 200).select(
            F.col("id"), F.lit("new").alias("tag")
        )
    )
    snap = t._load()
    assert "bucket_spec" not in snap.batches[0]
    assert snap.batches[1]["bucket_spec"] == ["id", 8, "bigint"]
    # old-batch key: full old batch scanned (no stamp), still found
    assert t.read_where([("id", "=", 5)]).count() == 1
    # new-batch key: pruned to one file in the new batch
    assert t.read_where([("id", "=", 150)]).count() == 1
    assert t.read().count() == 200
    # compaction rewrites under the current spec -> old rows migrate
    t.compact()
    snap2 = t._load()
    live = [b for b in snap2.batches if b.get("file_rows")]
    assert all(b.get("bucket_spec") for b in live)
    assert t.read_where([("id", "=", 5)]).count() == 1
    assert t.read().count() == 200


def test_rename_bucket_column_still_prunes(spark, catalog):
    spark_ = catalog.spark
    df = spark_.range(80).select(F.col("id"), F.lit("x").alias("v"))
    catalog.create_namespace("db")
    t = catalog.table("db", "rn")
    t.create(df.schema, bucket_by=("id", 8))
    t.append(df)
    t.rename_column("id", "key")
    # predicate on the CURRENT name reverse-maps to the stamped write
    # name — pruning survives the rename
    plan = t.plan_scan([("key", "=", 11)])
    assert plan["files_scanned"] == 1
    got = t.read_where([("key", "=", 11)]).collect()
    assert len(got) == 1 and got[0].key == 11


def test_widened_type_disables_pruning_but_stays_exact(spark, catalog):
    spark_ = catalog.spark
    df = spark_.range(50).select(
        F.col("id").cast("int").alias("id"), F.lit(1).alias("v")
    )
    catalog.create_namespace("db")
    t = catalog.table("db", "wd")
    t.create(df.schema, bucket_by=("id", 8))
    t.append(df)
    before = t.plan_scan([("id", "=", 3)])
    assert before["files_scanned"] == 1
    t.widen_column_type("id", "bigint")
    # the stamp's write-time type ("int") still hashes int-range
    # literals exactly as the writer did — pruning survives widening
    after = t.plan_scan([("id", "=", 3)])
    assert after["files_scanned"] == 1
    got = t.read_where([("id", "=", 3)]).collect()
    assert len(got) == 1 and got[0].id == 3
    # a literal outside int32 can't have been written by the int-typed
    # writer-side hash: gate refuses to guess, scan stays exact
    assert t.read_where([("id", "=", 2**31 + 5)]).count() == 0


def test_cow_delete_preserves_bucket_layout(spark, catalog):
    t, _ = _mk_bucketed(catalog, n_rows=100, n_buckets=4)
    t.delete_where("id < 10")
    assert t.read().count() == 90
    snap = t._load()
    live = [b for b in snap.batches if b.get("file_rows")]
    # the COW rewrite consulted the current spec: rewritten batch is
    # bucketed again
    assert all(b.get("bucket_spec") == ["id", 4, "bigint"] for b in live)
    assert t.read_where([("id", "=", 55)]).count() == 1
    assert t.read_where([("id", "=", 5)]).count() == 0


def test_bucket_spec_validation(spark, catalog):
    spark_ = catalog.spark
    df = spark_.range(5).select(
        F.col("id"), F.col("id").cast("double").alias("d")
    )
    catalog.create_namespace("db")
    t = catalog.table("db", "val")
    t.create(df.schema)
    with pytest.raises(ValueError, match="no such column"):
        t.set_bucket_spec("nope", 8)
    with pytest.raises(ValueError, match="int/bigint/string"):
        t.set_bucket_spec("d", 8)
    with pytest.raises(ValueError, match="out of range"):
        t.set_bucket_spec("id", 1)
    # junk property value errors loudly at write time
    t.set_bucket_spec("id", 8)
    t.set_properties({"write.bucket.n": "lots"})
    with pytest.raises(ValueError, match="not an integer"):
        t.append(df)


def test_contradictory_equality_prunes_everything(spark, catalog):
    t, _ = _mk_bucketed(catalog, n_rows=64, n_buckets=4)
    # id = 3 AND id = 40 hash to different buckets -> provably empty
    plan = t.plan_scan([("id", "=", 3), ("id", "=", 40)])
    assert plan["files_scanned"] == 0
    assert t.read_where([("id", "=", 3), ("id", "=", 40)]).count() == 0


# -- SQL routing ----------------------------------------------------------


def test_parse_partition_spec():
    assert _parse_partition_spec(None) == (None, None)
    assert _parse_partition_spec("NONE") == (None, None)
    assert _parse_partition_spec("MONTH(ts)") == ("ts", None)
    assert _parse_partition_spec("BUCKET(16, id)") == (None, ("id", 16))
    assert _parse_partition_spec("(MONTH(ts), BUCKET(4, id))") == (
        "ts", ("id", 4)
    )
    assert _parse_partition_spec("(bucket(4, id), month(ts))") == (
        "ts", ("id", 4)
    )
    with pytest.raises(ValueError, match="unsupported partition"):
        _parse_partition_spec("YEAR(ts)")
    with pytest.raises(ValueError, match="duplicate MONTH"):
        _parse_partition_spec("(MONTH(a), MONTH(b))")


def test_sql_ctas_and_alter_bucket_spec(spark, catalog):
    spark.range(60).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    ).createOrReplaceTempView("src60")
    catalog.sql(
        "CREATE TABLE lake.db.bt PARTITIONED BY BUCKET(8, id) "
        "AS SELECT * FROM src60"
    )
    t = catalog.table("db", "bt")
    assert t._bucket_spec() == ("id", 8)
    assert t.plan_scan([("id", "=", 13)])["files_scanned"] == 1
    assert (
        catalog.sql("SELECT g FROM lake.db.bt WHERE id = 13").first().g
        == 13 % 5
    )
    # spec replacement through SQL: NONE clears the bucket transform
    catalog.sql("ALTER TABLE lake.db.bt SET PARTITION SPEC NONE")
    assert t._bucket_spec() is None
    catalog.sql(
        "ALTER TABLE lake.db.bt SET PARTITION SPEC BUCKET(4, id)"
    )
    assert t._bucket_spec() == ("id", 4)
    with pytest.raises(ValueError, match="unsupported partition"):
        catalog.sql(
            "ALTER TABLE lake.db.bt SET PARTITION SPEC YEAR(id)"
        )


def test_murmur3_parity_randomized_battery(spark):
    """Seeded random battery over all three bucketable types — a much
    wider net than the boundary table, in ONE DataFrame comparison
    (vectorized; per-example Spark jobs would be prohibitively slow)."""
    import random
    import string

    rng = random.Random(20240814)
    ints = [rng.randint(-(2**31), 2**31 - 1) for _ in range(300)]
    longs = [rng.randint(-(2**63), 2**63 - 1) for _ in range(300)]
    alphabet = string.printable + "äöüßéñ中日√🚀"
    strs = [
        "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 40))
        )
        for _ in range(300)
    ]
    rows = (
        [(i, None, None) for i in ints]
        + [(None, lv, None) for lv in longs]
        + [(None, None, s) for s in strs]
    )
    got = spark.createDataFrame(
        rows, "i INT, l LONG, s STRING"
    ).select(
        "i", "l", "s",
        F.hash("i").alias("hi"),
        F.hash("l").alias("hl"),
        F.hash("s").alias("hs"),
    ).collect()
    checked = 0
    for r in got:
        if r.i is not None:
            assert spark_hash(r.i, "int") == r.hi
            checked += 1
        if r.l is not None:
            assert spark_hash(r.l, "bigint") == r.hl
            checked += 1
        if r.s is not None:
            assert spark_hash(r.s, "string") == r.hs
            checked += 1
    assert checked == 900


def test_bucket_pruning_under_mor_position_deletes(spark, catalog):
    """Interplay: a bucketed table with live MOR position deletes —
    pruned point lookups must still apply the (file, pos) anti-join and
    never resurrect deleted rows."""
    t, df = _mk_bucketed(catalog, n_rows=200, n_buckets=8)
    # keyless MOR delete by arbitrary predicate -> position-delete file
    t.delete_where("id % 10 = 3", mode="mor")
    assert any(d.get("content") == "pos" for d in t._load().deletes)
    # a deleted key: pruned scan still sees the delete
    assert t.read_where([("id", "=", 13)]).count() == 0
    # a live key in the same bucket as a deleted one still reads
    got = t.read_where([("id", "=", 14)]).collect()
    assert len(got) == 1 and got[0].id == 14
    assert t.read().count() == 180
    # folding the delete files restores pure pruned reads
    t.compact_deletes()
    assert not t._load().deletes
    assert t.read_where([("id", "=", 13)]).count() == 0
    assert t.read().count() == 180


def test_in_list_prunes_buckets_and_batches(spark, catalog):
    t, df = _mk_bucketed(catalog, n_rows=400, n_buckets=8)
    t.append(df.withColumn("id", F.col("id") + 1000))
    keys = [3, 44, 137]
    plan = t.plan_scan([("id", "in", keys)])
    # at most one file per listed key per batch
    assert plan["files_scanned"] <= len(keys) * 2
    assert plan["files_total"] == 16
    got = sorted(
        r.id for r in t.read_where([("id", "in", keys)]).collect()
    )
    assert got == [3, 44, 137]
    # IN + range conjunction composes
    got2 = sorted(
        r.id
        for r in t.read_where(
            [("id", "in", keys), ("id", ">", 40)]
        ).collect()
    )
    assert got2 == [44, 137]
    # empty IN matches nothing and plans nothing
    assert t.plan_scan([("id", "in", [])])["files_scanned"] == 0
    assert t.read_where([("id", "in", [])]).count() == 0
    with pytest.raises(ValueError, match="list of literals"):
        t.read_where([("id", "in", 5)])


def test_in_list_stats_skipping_unbucketed(spark, catalog):
    spark_ = catalog.spark
    catalog.create_namespace("db")
    t = catalog.table("db", "instats")
    df = spark_.range(0, 100).toDF("id")
    t.create(df.schema)
    t.append(df)                                  # [0, 99]
    t.append(spark_.range(1000, 1100).toDF("id"))  # [1000, 1099]
    # all listed keys provably outside batch 2 -> one batch planned
    plan = t.plan_scan([("id", "in", [5, 50])])
    assert plan["batches_scanned"] == 1
    got = sorted(
        r.id for r in t.read_where([("id", "in", [5, 1050])]).collect()
    )
    assert got == [5, 1050]
